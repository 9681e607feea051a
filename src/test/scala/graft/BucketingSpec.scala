package graft

import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the 100 TB join strategy the scale
  * notes claim: pre-bucket both sides on the join key and the sort-merge
  * join runs with NO exchange on either side (bucket files align with
  * partitions). Asserted on real parquet bucket tables, not prose. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed-by-join-key tables join without a shuffle") {
    import spark.implicits._
    // tables land in the default ./spark-warehouse (gitignored), dropped below
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_quantity")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: at test scale Spark would broadcast,
      // which ignores buckets — at 100 TB neither side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          $"o_orderkey" === $"l_orderkey")
      joined.collect() // force execution so the final plan is real
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it is a real join producing the right cardinality
      val expected = lineitem.join(orders,
        $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
