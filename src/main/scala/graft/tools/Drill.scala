package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate where a query's seconds go (round 14: q367). */
object Drill {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    val s = spark.newSession()
    org.apache.spark.sql.GraftBridge.installOptimizerRule(s,
      graft.plans.IntervalJoinRule)
    import org.apache.spark.sql.{functions => F}
    def spans(ss: SparkSession) = {
      val i = ss.implicits; import i._
      graft.sources.Tables.events(ss, dir)
        .filter($"event_type".isin("view", "purchase"))
        .groupBy($"user_id", to_date($"ts").as("day"), $"event_type")
        .agg(F.min(unix_micros($"ts")).as("t0"),
          F.max(unix_micros($"ts")).as("t1"))
    }
    time("spans_count") { spans(spark).count() }
    // inner join volume: q349's bucketed pairs (no agg)
    time("q349_full") {
      graft.operators.TimeQueries.queries("q349_interval_join")(
        spark, dir).count()
    }
    for (w <- Seq(21600000000L, 43200000000L, 86400000000L)) {
      s.conf.set(graft.plans.IntervalJoinRule.WidthConf, w.toString)
      s.conf.set(graft.plans.IntervalJoinRule.MaxSpanConf,
        "86400000000")
      val i2 = s.implicits; import i2._
      val sp = spans(s)
      val v = sp.filter($"event_type" === "view")
        .select($"user_id".as("vu"), $"day",
          $"t0".as("v0"), $"t1".as("v1"))
      val p = sp.filter($"event_type" === "purchase")
        .select($"user_id".as("pu"), $"t0".as("p0"), $"t1".as("p1"))
      val j = v.join(p,
        $"vu" =!= $"pu" && $"v0" <= $"p1" && $"p0" <= $"v1",
        "left_outer")
      time(s"outer_join_count_w${w / 3600000000L}h") { j.count() }
    }
    spark.stop()
  }
}
