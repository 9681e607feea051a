package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate where the q1_agg seconds go. */
object Drill {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DRILL $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r)")
    }
    for (i <- 1 to 3) {
      time(s"raw_count_$i") {
        spark.read.parquet(s"$dir/lineitem.parquet").count()
      }
      time(s"filter_count_$i") {
        spark.read.parquet(s"$dir/lineitem.parquet")
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")).count()
      }
      time(s"groupby_count_$i") {
        spark.read.parquet(s"$dir/lineitem.parquet")
          .groupBy($"l_returnflag").agg(sum($"l_quantity")).count()
      }
      time(s"q1_full_$i") {
        graft.operators.Relational.q1Agg(spark, dir).count()
      }
    }
    spark.stop()
  }
}
