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

  private def executedAsOf(df: org.apache.spark.sql.DataFrame)
      : graft.plans.AsOfJoinExec = {
    // AQE wraps executed subtrees in QueryStageExec LEAF nodes (Spark
    // 4's ResultQueryStage included) — descend through them explicitly
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[graft.plans.AsOfJoinExec] = p match {
      case e: graft.plans.AsOfJoinExec => Some(e)
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => find(q.plan)
      case other => other.children.view.flatMap(find(_)).headOption
    }
    find(df.queryExecution.executedPlan)
      .getOrElse(fail("no AsOfJoinExec in plan"))
  }

  test("asof WITHIN tolerance: boundary gap matches, gap+1 nulls out") {
    import spark.implicits._
    // key 1: p@100 has latest click r@90 (gap 10), p@200 has r@195
    // (gap 5); key 2: p@50 has only r@10 (gap 40). With tol=10 the
    // boundary gap MATCHES (≤, not <); with tol=9 it nulls out — and
    // never falls back to an older row.
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, "r90"), (1L, 195L, "r195"),
      (2L, 10L, "r10")).toDF("k", "t", "rtag")
    def run(tol: Long): Map[String, String] =
      graft.plans.AsOfJoin.of(left, right, "k", "t", Some(tol))
        .select($"tag", $"rtag").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run(10L) ==
      Map("p1" -> "r90", "p2" -> "r195", "p3" -> null))
    assert(run(9L) ==
      Map("p1" -> null, "p2" -> "r195", "p3" -> null))
    // no tolerance: same merge, every latest-at-or-before row kept
    val unbounded = graft.plans.AsOfJoin.of(left, right, "k", "t")
      .select($"tag", $"rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(unbounded ==
      Map("p1" -> "r90", "p2" -> "r195", "p3" -> "r10"))
  }

  test("asof operator reports SQL metrics") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, "r90"), (2L, 10L, "r10"))
      .toDF("k", "t", "rtag")
    // tol=10: p1 matches r90 (gap 10, boundary), p2's candidate is 110
    // stale, p3's is 40 stale → 3 output rows, exactly 1 matched
    val df = graft.plans.AsOfJoin.of(left, right, "k", "t", Some(10L))
    df.collect()
    val exec = executedAsOf(df)
    assert(exec.metrics("numOutputRows").value == 3L)
    assert(exec.metrics("numMatchedRows").value == 1L)
  }

  test("BandJoinRule: rewrite ≡ predicate on signed data, both spellings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.abs
    // values straddle 0 and the ε+1=4 bucket boundaries, so a
    // truncating (toward-zero) bucket division would mis-bucket the
    // negatives — the floor-div sign-safety this pins
    val xs = Seq(-7L, -6L, -4L, -1L, 0L, 3L, 4L, 10L)
    val l = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("lid", "xl")
    val r = xs.zipWithIndex.map { case (x, i) => (i.toLong + 100, x) }
      .toDF("rid", "xr")
    val expect = (for {
      (x, i) <- xs.zipWithIndex; (y, j) <- xs.zipWithIndex
      if math.abs(x - y) <= 3
    } yield (i.toLong, j.toLong + 100)).toSet
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"lid", $"rid").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
    val absForm = l.join(r, abs($"xl" - $"xr") <= 3L)
    val betweenForm =
      l.join(r, $"xl" >= $"xr" - 3L && $"xl" <= $"xr" + 3L)
    for (df <- Seq(absForm, betweenForm)) {
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("_band_bkt"), s"rule did not fire:\n$opt")
      assert(pairs(df) == expect)
    }
    // equi-keyed joins are NOT rewritten: the planner already hashes
    // on the key and the band predicate is a fine residual
    val keyed = l.join(r, $"lid" === $"rid" - 100L &&
      abs($"xl" - $"xr") <= 3L)
    assert(!keyed.queryExecution.optimizedPlan.toString
      .contains("_band_bkt"))
    assert(pairs(keyed) == expect.filter { case (a, b) => a == b - 100 })
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
