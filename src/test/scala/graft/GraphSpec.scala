package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphQueries

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("pagerank: mass conserved, floor respected, not uniform") {
    import spark.implicits._
    val ranks = GraphQueries.qPagerank(spark, sf)
      .as[(Long, Double)].collect()
    assert(ranks.nonEmpty)
    val n = ranks.length.toDouble
    // dangling redistribution means total mass stays exactly 1
    val mass = ranks.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-2, s"rank mass $mass drifted from 1")
    // every node keeps the teleport floor (1-d)/N
    val floor = (1.0 - 0.85) / n
    ranks.foreach { case (node, r) =>
      assert(r >= floor - 1e-6, s"node $node rank $r under the floor $floor")
    }
    // the transition graph is not regular, so ranks must spread
    assert(ranks.map(_._2).distinct.length > 1, "ranks collapsed to uniform")
  }
}
