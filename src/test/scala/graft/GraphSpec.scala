package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphQueries

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("triangles: degree-oriented count matches hand-counted fixtures") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, 12 wedges) plus pendant 5—1
    // (no new triangle, 3 new wedges at node 1): clustering = 12/15
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L)).toDF("a", "b")
    val row = GraphQueries.triangleStats(und).collect().head
    assert(row.getAs[Long]("n_nodes") === 5L)
    assert(row.getAs[Long]("n_edges") === 7L)
    assert(row.getAs[Long]("n_wedges") === 15L)
    assert(row.getAs[Long]("n_triangles") === 4L)
    assert(row.getAs[Double]("clustering") === 0.8)
  }

  test("triangles: hub with no closure counts zero") {
    import spark.implicits._
    // star K1,6: every wedge is open — the exact hot-hub shape degree
    // orientation exists for (all edges orient AWAY from leaves, so the
    // hub never enumerates its neighbor square)
    val star = (2L to 7L).map(i => (1L, i)).toDF("a", "b")
    val row = GraphQueries.triangleStats(star).collect().head
    assert(row.getAs[Long]("n_triangles") === 0L)
    assert(row.getAs[Long]("n_wedges") === 15L)
  }

  test("star contraction: multi-component fixture labels by component min") {
    import spark.implicits._
    // three components: a 5-chain (worst case for contraction — long
    // diameter), a triangle, and an isolated edge
    val und = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), // chain, min 10
      (20L, 21L), (20L, 22L), (21L, 22L),             // triangle, min 20
      (30L, 31L)).toDF("a", "b")                      // edge, min 30
    val got = GraphQueries.starComponents(und)
      .as[(Long, Long)].collect().toMap
    val want = Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L)
    assert(got === want)
  }

  test("star contraction agrees with q64-style reachability on q158's graph") {
    import spark.implicits._
    val comps = GraphQueries.qConnectedStars(spark, sf)
      .as[(Long, Long)].collect()
    assert(comps.nonEmpty)
    // every label is a member of its own component (root property) and
    // is the minimum of the nodes that carry it
    val byComp = comps.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.map(_._1).min === comp,
        s"component $comp root is not its min member")
    }
    // sf0.001 with MinEdgeWeight=2 is a sparse graph — the fixture data
    // splits into >1 component (guards against a trivially-dense demo)
    assert(byComp.size > 1, "expected a multi-component graph at sf0.001")
  }

  test("component sizes: shares sum to 1, sizes consistent with labels") {
    import spark.implicits._
    val hist = GraphQueries.qComponentSizes(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(hist.nonEmpty)
    val share = hist.map(_._3).sum
    assert(math.abs(share - 1.0) < 0.01, s"node shares sum to $share")
    val nodesFromHist = hist.map(t => t._1 * t._2).sum
    val nodes = GraphQueries.qConnectedStars(spark, sf).count()
    assert(nodesFromHist == nodes)
  }

  test("coengagement: capped, canonical, ordered by support") {
    import spark.implicits._
    val rows = GraphQueries.qCoengagement(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { case (_, a, b, n) => assert(a < b && n >= 1) }
    val counts = rows.map(_._4)
    assert(counts.sameElements(counts.sorted.reverse),
      "pairs must be ranked by descending shared-user count")
  }

  /** Reference LPA: 4 synchronous rounds, mode label with min
    * tie-break — the spec the DataFrame version must reproduce. */
  private def lpaRef(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = adj.map { case (u, ns) =>
        val counts = ns.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        u -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    lbl
  }

  test("LPA: matches a driver-side reference on a bridged two-clique fixture") {
    import spark.implicits._
    // two K4 cliques joined by one bridge edge — the canonical
    // "communities connectivity alone can't split" fixture (CC puts
    // all 8 nodes in one component)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L),
      (12L, 13L),
      (4L, 10L))
    val got = GraphQueries.lpaLabels(edges.toDF("a", "b"))
      .select("node", "comm").as[(Long, Long)].collect().toMap
    assert(got === lpaRef(edges, 4))
    // and the sweep is deterministic across runs
    val again = GraphQueries.lpaLabels(edges.toDF("a", "b"))
      .select("node", "comm").as[(Long, Long)].collect().toMap
    assert(again === got)
  }

  test("BFS: hop counts match a driver-side BFS; 4-hop horizon leaves the tail unreached") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7-8-9 plus isolated edge 100-101: seeds are
    // min=1 and max=101; node 5 is 4 hops from seed 1 on the path,
    // nodes 6-9 sit beyond the 4-round horizon → unreached
    val edges = (1L to 8L).map(i => (i, i + 1)) :+ (100L, 101L)
    val got = GraphQueries.bfsDistances(edges.toDF("a", "b"))
      .select("node", "hops").as[(Long, Option[Long])].collect().toMap
    // reference BFS from {1, 101} truncated at 4 rounds
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    var dist = Map[Long, Long](1L -> 0L, 101L -> 0L)
    for (_ <- 1 to 4) {
      val ext = dist.toSeq.flatMap { case (u, d) =>
        adj(u).map(v => (v, d + 1)) }
      dist = (dist.toSeq ++ ext).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    val want = adj.keys.map(n => n -> dist.get(n)).toMap
    assert(got === want)
    assert(got(6L).isEmpty && got(9L).isEmpty, "tail past 4 hops must be unreached")
    assert(got(5L) === Some(4L) && got(100L) === Some(1L))
  }

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

  test("pagerank: lineage-truncated path equals the lazy plan exactly") {
    import spark.implicits._
    val lazyRanks = GraphQueries.qPagerank(spark, sf)
      .as[(Long, Double)].collect().toSeq
    val ckRanks = GraphQueries.pagerankWith(spark, sf, 3, Some(true))
      .as[(Long, Double)].collect().toSeq
    assert(lazyRanks == ckRanks,
      "localCheckpoint must be a pure plan change, not a result change")
    // past the threshold the default flips on: more iterations still
    // converge (mass conserved) through the checkpointed path
    val deep = GraphQueries.pagerankWith(spark, sf, 5)
      .as[(Long, Double)].collect()
    assert(math.abs(deep.map(_._2).sum - 1.0) < 1e-2,
      "checkpointed deep run must still conserve rank mass")
  }
}
