package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Lineage-truncation barrier for driver-side iterative loops (CC
  * label-prop, PageRank/PPR/HITS, suffix-array doubling, GD trainers,
  * k-core peeling, …). Every round of such a loop MUST end in a
  * checkpoint barrier or round d re-evaluates the base scan O(b^d)×
  * (the q285 round-9 blowup; Round10Spec pins the structure).
  *
  * Two barrier flavors, switched by one runtime conf:
  *
  *  - `graft.checkpoint.dir` UNSET (default): `localCheckpoint` —
  *    executor-local blocks, zero distributed-FS traffic. Right for
  *    local[32] and for clusters that accept re-running a lost job.
  *  - `graft.checkpoint.dir` SET to a durable directory (HDFS/S3 on a
  *    real cluster): Spark's reliable `checkpoint()` against it —
  *    blocks survive executor loss, so a 1000-executor iterative job
  *    over 100 TB doesn't die mid-iteration when one executor is
  *    preempted. This is the production form; localCheckpoint's
  *    executor-local blocks are gone with the executor (Spark docs,
  *    RDD.localCheckpoint).
  *
  * Both forms are EAGER by default (the loop's round must materialize
  * before the next round builds on it) and both bottom out in a
  * LogicalRDD leaf, so the Round10Spec structural guard holds under
  * either setting.
  */
object Barrier {
  /** Runtime conf key: durable checkpoint directory. Set it via
    * `--conf spark.graft.checkpoint.dir=hdfs://…` … exposed through
    * SQLConf so `spark.conf.set(...)` works per-session too. */
  val DirConf = "graft.checkpoint.dir"

  // remember which conf value we last applied per SparkContext, so the
  // UUID-subdir-creating setCheckpointDir only runs when the knob
  // changes, not once per round
  private val applied =
    new java.util.concurrent.ConcurrentHashMap[SparkContext, String]()

  private def ensureDir(sc: SparkContext, dir: String): Unit =
    if (applied.get(sc) != dir) synchronized {
      if (applied.get(sc) != dir) {
        sc.setCheckpointDir(dir)
        applied.put(sc, dir)
      }
    }

  implicit final class BarrierOps(private val df: DataFrame)
      extends AnyVal {
    /** Eager barrier — the form every round of an iterative core ends
      * in. Reliable when `graft.checkpoint.dir` is set, local else. */
    def roundBarrier(): DataFrame = roundBarrier(eager = true)

    def roundBarrier(eager: Boolean): DataFrame = {
      val s = df.sparkSession
      val dir = s.conf.getOption(Barrier.DirConf)
        .map(_.trim).filter(_.nonEmpty)
      dir match {
        case Some(d) =>
          ensureDir(s.sparkContext, d)
          df.checkpoint(eager)
        case None =>
          df.localCheckpoint(eager)
      }
    }
  }
}
