package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: runs each SparkEntry query twice in one JVM and
  * prints both timings — separates plan/codegen warmup from steady-state
  * execution. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    // match Bench's session shape: core count from SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same session shape as Bench, so profiled plans match benched plans
    org.apache.spark.sql.GraftBridge.installOptimizerRule(spark,
      graft.plans.TopKWindowRule)
    org.apache.spark.sql.GraftBridge.installOptimizerRule(spark,
      graft.plans.BandJoinRule)
    org.apache.spark.sql.GraftBridge.installOptimizerRule(spark,
      graft.plans.IntervalJoinRule)
    org.apache.spark.sql.GraftBridge.installStrategy(spark,
      graft.plans.AsOfJoinStrategy)
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    qs.foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // noop sink, NOT count(): count() lets Catalyst prune every
        // unreferenced projection and under-measures (same contract as
        // Bench after the round-1 verdict)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val c = once(); val w = once()
      println(f"PROFILE $name%-24s cold=$c%7.2fs warm=$w%7.2fs")
    }
    spark.stop()
  }
}
