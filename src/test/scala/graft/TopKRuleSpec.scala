package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.execution.ExplainMode
import graft.plans.TopKWindowRule

/** The Filter(row_number <= k) over Window rewrite: fires on the idiom,
  * leaves everything else alone, and never changes results. Runs in a
  * child session so the shared test session's plans stay untouched. */
class TopKRuleSpec extends AnyFunSuite {
  lazy val base = TestSpark.spark
  lazy val opt = {
    val s = base.newSession()
    GraftBridge.installOptimizerRule(s, TopKWindowRule)
    s
  }
  val sf = "/root/testdata/sf0.001"

  private def optimized(name: String): String = {
    val df = SparkEntry.queries(name)(opt, sf)
    df.queryExecution.optimizedPlan.toString
  }

  test("q3 rewrites: top_k_rows aggregate replaces the window") {
    val p = optimized("q3_window_topk")
    assert(p.contains("top_k_rows"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"window survived the rewrite:\n$p")
  }

  test("q3 results identical with and without the rewrite") {
    val plain = SparkEntry.queries("q3_window_topk")(base, sf).collect().toSeq
    val rewritten = SparkEntry.queries("q3_window_topk")(opt, sf).collect().toSeq
    assert(rewritten == plain)
    assert(plain.nonEmpty)
  }

  test("q12 flagship results identical under the rewrite") {
    val plain = SparkEntry.queries("q12_bigrams_topk")(base, sf).collect().toSeq
    val rewritten =
      SparkEntry.queries("q12_bigrams_topk")(opt, sf).collect().toSeq
    assert(rewritten == plain)
  }

  test("physical plan: partial/final ObjectHashAggregate, no window sort") {
    val df = SparkEntry.queries("q3_window_topk")(opt, sf)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("ObjectHashAggregate"))
    assert(!p.contains("WindowGroupLimit") && !p.contains("RunningWindowFunction"))
  }

  test("global top-k (empty partition spec) rewrites to a single-group heap") {
    val p = optimized("q37_vocab_topk")
    assert(p.contains("top_k_rows"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"window survived:\n$p")
    val plain = SparkEntry.queries("q37_vocab_topk")(base, sf).collect().toSeq
    val rewritten =
      SparkEntry.queries("q37_vocab_topk")(opt, sf).collect().toSeq
    assert(rewritten == plain && plain.nonEmpty)
  }

  test("windows without a rank filter are untouched") {
    // q17 uses count() OVER (PARTITION BY fp) with no row_number filter
    val p = optimized("q17_fingerprint")
    assert(!p.contains("top_k_rows"))
    assert(p.contains("Window"))
  }
}
