package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter join pre-filter — the distributed "semi-join reduction"
  * for a selective join: aggregate the small side's keys into one bloom
  * filter sketch (partial aggregation applies: each task builds a local
  * filter, merge is bitwise-OR), then drop large-side rows that cannot
  * match BEFORE the join shuffle. The probe is a codegen'd hash + bitset
  * test per row; false positives are removed by the exact join that
  * follows, so results never change — only the shuffle volume does.
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling the ~selectivity fraction of it. It composes the
  * same expressions Spark's own AQE runtime filter injects
  * (BloomFilterAggregate / BloomFilterMightContain wrapped in XxHash64),
  * but as an explicit operator: available without AQE, on any plan
  * shape, with a caller-controlled size bound.
  *
  * The sketch reaches the probe side as an uncorrelated scalar subquery
  * — Spark runs the build as its own job and embeds the ~MB binary into
  * the probe stage, never a driver-side key set.
  */
object BloomJoin {

  /** One-row frame holding the bloom filter of `key` over `keys`.
    * `expectedItems` bounds the sketch size (bits scale linearly with
    * it) — size it to the small side's cardinality, not the corpus. */
  def bloomOf(keys: DataFrame, key: Column, expectedItems: Long): DataFrame =
    keys.select(GraftBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftBridge.expression(key))), expectedItems)
        .toAggregateExpression()).as("bloom"))

  /** `large` minus the rows whose `largeKey` definitely isn't in
    * `smallKeys.smallKey`. Keep the exact join downstream: the filter
    * admits false positives (default fpp 3%). */
  def preFilter(large: DataFrame, largeKey: Column,
      smallKeys: DataFrame, smallKey: Column,
      expectedItems: Long): DataFrame = {
    val bloom = bloomOf(smallKeys, smallKey, expectedItems)
    large.filter(GraftBridge.column(new BloomFilterMightContain(
      GraftBridge.scalarSubquery(bloom),
      new XxHash64(Seq(GraftBridge.expression(largeKey))))))
  }
}
