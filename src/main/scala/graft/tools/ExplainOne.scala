package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-16 plan evidence: writes `.explain("formatted")` for the named
  * queries to <outDir>/<query>_<suffix>.txt. Usage:
  *   sbt "runMain graft.tools.ExplainOne <sfDir> <outDir> <suffix> q..."
  * Not part of the driver contract. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.GraftBridge.installOptimizerRule(spark,
      graft.plans.TopKWindowRule)
    org.apache.spark.sql.GraftBridge.installOptimizerRule(spark,
      graft.plans.BandJoinRule)
    org.apache.spark.sql.GraftBridge.installOptimizerRule(spark,
      graft.plans.IntervalJoinRule)
    org.apache.spark.sql.GraftBridge.installStrategy(spark,
      graft.plans.AsOfJoinStrategy)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[explain] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
