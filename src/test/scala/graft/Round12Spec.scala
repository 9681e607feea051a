package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Pins for the round-12 work: the cluster-durable checkpoint barrier
  * (`graft.checkpoint.dir` → reliable `checkpoint()` instead of
  * `localCheckpoint()`). Each test fails on the pre-round-12 form. */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("graft.checkpoint.dir: barriers become reliable checkpoints") {
    // A durable dir set on the SESSION (newSession isolates SQLConf;
    // the SparkContext is shared) must switch every round barrier from
    // executor-local blocks to reliable checkpoint files under the dir
    // — the form that survives executor loss on a real cluster. The
    // structural contract is unchanged (LogicalRDD leaves, so the
    // Round10Spec guard holds under either setting); the new assertion
    // is that the leaf RDDs are RELIABLY checkpointed (a checkpoint
    // file exists) and that results are bit-identical to the local
    // form.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_").toString
    val s2 = spark.newSession()
    s2.conf.set(Barrier.DirConf, dir)
    import org.apache.spark.sql.{DataFrame, SparkSession}
    def cores(s: SparkSession): Seq[(String, DataFrame)] = {
      val sess = s // give the implicits a stable path
      import sess.implicits._
      val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
        .toDF("a", "b")
      Seq(
        "starComponents" -> GraphQueries.starComponents(und),
        "pprCore" -> GraphQueries.pprCore(
          Seq((1L, 2L, 2.0), (2L, 3L, 1.0)).toDF("src", "dst", "w")),
        "suffixRanks" -> DedupQueries.buildSuffixRanks(s, sf),
        "logregCore" -> ScoringQueries.logregCore(
          Seq((1.0, 0.1, 0.2), (0.0, 0.3, 0.4)).toDF("y", "x1", "x2")))
    }
    val reliable = cores(s2)
    for ((name, df) <- reliable) {
      val leaves = df.queryExecution.analyzed.collectLeaves()
      assert(leaves.nonEmpty, name)
      // same structural leaf either way…
      assert(leaves.forall(_.getClass.getSimpleName == "LogicalRDD"),
        s"$name: " +
          leaves.map(_.getClass.getSimpleName).distinct.mkString(","))
      // …but now backed by a RELIABLE checkpoint: the leaf RDD carries
      // a checkpoint file under the configured dir
      val rdds = leaves.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      assert(rdds.nonEmpty, name)
      assert(rdds.forall(_.getCheckpointFile.exists(_.contains(dir))),
        s"$name: barrier leaves must be reliably checkpointed under " +
          s"$dir, got ${rdds.map(_.getCheckpointFile)}")
    }
    // checkpoint files actually landed on the durable store
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, "reliable checkpoint wrote no files")
    // and the knob changes WHERE rounds persist, never WHAT they
    // compute: reliable ≡ local, row for row
    val local = cores(spark).toMap
    for ((name, df) <- reliable) {
      val a = df.collect().map(_.toString).sorted.toSeq
      val b = local(name).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name: reliable != local")
    }
  }

  test("barrier stays local when the dir conf is unset") {
    import spark.implicits._
    // the default path must not touch any checkpoint dir (bench posture
    // unchanged): leaves are locally checkpointed, no checkpoint file
    val und = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val df = GraphQueries.starComponents(und)
    val rdds = df.queryExecution.analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    assert(rdds.nonEmpty)
    assert(rdds.forall(_.getCheckpointFile.isEmpty),
      "unset knob must keep executor-local barriers")
  }
}
