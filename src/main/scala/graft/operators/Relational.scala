package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryModule
import graft.sources.Tables

/** Relational coverage over the TPC-H-ish star schema (SURVEY.md §2.2):
  * scans, filters/projections, equi joins (broadcast + shuffle), semi/anti
  * joins, hash aggregation, window top-k, sorts/limits, set ops, rollup.
  *
  * The reference itself has only a left-anti membership dedup
  * (rss_consumer.py:68-74); the rest of this module exists to prove the
  * relational categories against the DuckDB oracle, built Spark-first.
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region/nation, and at moderate scale customer/
  *    supplier) are broadcast — no shuffle on the fact side;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  *    handles skew/coalescing at runtime;
  *  - aggregations rely on partial (map-side) aggregation for free via
  *    groupBy().agg();
  *  - the trailing orderBy in every query exists ONLY for oracle hash
  *    determinism; it is not part of the operator being proven.
  */
object Relational extends QueryModule {

  /** Exact money accumulators: price and discounted-price summed in
    * DECIMAL, not double. A handful of groups over the whole lineitem
    * table drives each group total past 1e9, where a double sum's
    * accumulated rounding (order-dependent — Spark's partial-agg order
    * is not DuckDB's scan order) is of the same magnitude as the
    * 4-decimal output precision; q117 hash-mismatched live at sf0.1 on
    * exactly this before moving to decimal. The decimal sum is exact
    * in any order; display casts to double only after aggregation.
    * Same expressions on the oracle side via RevSql/PriceSql. */
  private[operators] def priceDec =
    col("l_extendedprice").cast("decimal(18,4)")
  private[operators] def revDec = priceDec *
    (lit(1.0).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
  private[operators] val PriceSql = "CAST(l_extendedprice AS DECIMAL(18,4))"
  private[operators] val RevSql =
    s"$PriceSql * (CAST(1.0 AS DECIMAL(18,4)) - " +
      "CAST(l_discount AS DECIMAL(18,4)))"

  /** TPC-H Q1-style pricing summary: filtered scan + hash agg.
    * Filter + column pruning push into the parquet scan. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(sum(priceDec).cast("double"), 4).as("sum_base_price"),
        round(sum(revDec).cast("double"), 4).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Multi-way join: fact ⋈ broadcast dims, revenue per nation.
    * region/nation are tiny → explicit broadcast; customer/orders join
    * shuffles on keys (AQE re-plans at runtime). */
  def q2JoinRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li  = Tables.lineitem(s, dir)
    val o   = Tables.orders(s, dir)
    val c   = Tables.customer(s, dir)
    val n   = Tables.nation(s, dir)
    val r   = Tables.region(s, dir)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum(revDec).cast("double"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  /** Window top-k: top-3 orders per customer by totalprice.
    * One shuffle on o_custkey; row_number inside the window. */
  def q3WindowTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey",
        round($"o_totalprice", 4).as("o_totalprice"), $"rk")
      .orderBy($"o_custkey", $"rk")
  }

  /** Filtered projection scan — the plan must show PushedFilters +
    * pruned ReadSchema (only 4 columns leave the scan). */
  def q4FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_quantity" < 24)
      .select($"l_orderkey", $"l_linenumber",
        round($"l_extendedprice" * $"l_discount", 4).as("disc_revenue"),
        $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Left-anti membership dedup — the reference's F1
    * (rss_consumer.py:68-74): drop records whose key is already in the
    * "seen" set. Here: purchase events by users who have NO signup event.
    * At scale the seen-set is a parquet sink side, not an in-memory list
    * (the reference's frozen `links` list is the anti-pattern). */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
    val seen = ev.filter($"ts" < cutoff)
      .select($"user_id", $"props").distinct()
    ev.filter($"ts" >= cutoff && $"event_type" === "purchase")
      .join(seen, Seq("user_id", "props"), "left_anti")
      .select($"event_id", $"user_id", $"props", round($"value", 4).as("value"))
      .orderBy($"event_id")
  }

  /** Left-semi (EXISTS): customers having at least one high-value order. */
  def q6SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter($"o_totalprice" > 100000.0)
    c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Set ops: users who purchased EXCEPT users who errored, UNION users
    * who did both (intersect) — tagged. */
  def q7SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    def users(t: String) = ev.filter($"event_type" === t).select($"user_id").distinct()
    val purchasers = users("purchase")
    val errored    = users("error")
    purchasers.except(errored).withColumn("tag", lit("purchase_only"))
      .union(purchasers.intersect(errored).withColumn("tag", lit("both")))
      .orderBy($"tag", $"user_id")
  }

  /** Rollup (hierarchical grouping sets): order counts by status × priority
    * with subtotals. GROUPING() disambiguates real NULLs from rollup rows. */
  def q8Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 4).as("sum_price"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"))
      .orderBy($"g_status", $"g_prio", $"o_orderstatus", $"o_orderpriority")
  }

  /** Skew-resistant two-stage (salted) aggregation. `event_type` has ~5
    * distinct values — at cluster scale a direct groupBy funnels the
    * whole table into 5 reducer partitions. Stage 1 fans each hot key
    * out across 16 salt buckets (map-side partial agg still applies);
    * stage 2 combines the 5×16 partials. Results identical to the direct
    * agg — the oracle is the *unsalted* SQL. */
  def q9SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val salted = Tables.events(s, dir)
      .withColumn("salt", pmod(hash($"event_id"), lit(16)))
    val partial = salted.groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("pn"), sum($"value").as("psum"))
    partial.groupBy($"event_type")
      .agg(sum($"pn").as("n"),
        round(sum($"psum"), 4).as("sum_value"))
      .orderBy($"event_type")
  }

  /** Skew-resistant SALTED JOIN — the join-side sibling of q9's salted
    * aggregation. When one probe-side key dominates (one partkey = half
    * the fact table at 100 TB), a plain shuffle join funnels the hot
    * key into a single reducer. Salting spreads it: the fact side gets
    * a deterministic salt in [0, S), the dim side is replicated S ways
    * (exploded sequence), and the join key becomes (key, salt) — each
    * reducer sees 1/S of the hot key, and the replication factor
    * multiplies only the SMALL side. Results are identical to the
    * unsalted join, so the oracle is the plain SQL. The shuffle_hash
    * hint keeps Spark from picking broadcast here (broadcast would
    * hide the exchange this query exists to exercise; at real scale
    * the dim is above the broadcast threshold or the build side of an
    * existing shuffle). AQE's skew-join split is the automatic cousin;
    * salting is the explicit form that also survives a follow-on
    * keyed aggregation. */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val S = 8
    val fact = Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_extendedprice", $"l_discount",
        pmod($"l_orderkey" * 7 + $"l_linenumber", lit(S)).as("salt"))
    val dim = Tables.part(s, dir)
      .select($"p_partkey", $"p_brand",
        explode(sequence(lit(0), lit(S - 1))).as("salt"))
    fact
      .join(dim.hint("shuffle_hash"),
        fact("l_partkey") === dim("p_partkey") &&
          fact("salt") === dim("salt"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"),
        round(sum(revDec).cast("double"), 4).as("revenue"))
      .orderBy($"p_brand")
  }

  /** Distinct aggregation (§2.2 gap): multiple DISTINCT aggregates in one
    * pass — Spark plans an expand + two-phase aggregate. */
  def q9bDistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        round(sum_distinct($"value"), 4).as("sum_distinct_value"))
      .orderBy($"event_type")
  }

  /** TPC-H Q5-shaped 5-way star join: region-filtered nation revenue
    * across customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region,
    * with the classic non-tree condition c_nationkey = s_nationkey.
    * Written as plain declarative joins — Catalyst reorders, pushes the
    * region/date filters into the scans, and broadcasts every dim
    * (region/nation/supplier/customer are all orders-of-magnitude
    * smaller than lineitem), so the fact table is shuffled only for the
    * final aggregate. At 100 TB the same plan holds: dims that outgrow
    * the broadcast threshold degrade to shuffle joins keyed on their
    * own fk — no code change. */
  def qStarJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= "1995-01-01" && $"o_orderdate" < "1997-01-01")
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter($"r_name" === "ASIA")
    c.join(o, $"c_custkey" === $"o_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .join(su, $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(n, $"s_nationkey" === $"n_nationkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(revDec).cast("double"), 4).as("revenue"))
      .orderBy($"n_name")
  }

  /** CUBE aggregation (all four (lang, source) grouping combinations in
    * one pass) — completes the grouping-sets surface next to q8's
    * rollup. Spark plans a single Expand + aggregate, so the input is
    * read once however many grouping sets there are. Grouping flags
    * disambiguate NULL-as-total from a (hypothetical) NULL key, and
    * lead the sort so the hash compare never orders by a nullable
    * column (q8's NULLS FIRST/LAST lesson). */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .cube($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        // grouping() is only resolvable inside the cube's aggregate
        grouping($"lang").cast("int").as("g_lang"),
        grouping($"source").cast("int").as("g_source"))
      .select($"g_lang", $"g_source",
        coalesce($"lang", lit("ALL")).as("lang"),
        coalesce($"source", lit("ALL")).as("source"),
        $"n_docs")
      .orderBy($"g_lang", $"g_source", $"lang", $"source")
  }

  /** Pivot: per-language doc counts spread across an EXPLICIT source
    * column list. The explicit values list matters at scale — Spark's
    * value-less pivot() first collects the distinct pivot keys to the
    * driver, which is exactly the hidden driver round-trip a 100 TB
    * plan can't afford; with the list supplied the whole thing is one
    * Expand-free aggregate. Absent combinations surface as 0, not null
    * (pivot-count leaves them null; the oracle's FILTER counts give 0 —
    * coalesce reconciles the engines). */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val srcs = Seq("src0", "src1", "src2", "src3")
    Tables.documents(s, dir)
      .groupBy($"lang")
      .pivot("source", srcs)
      .agg(count(lit(1)))
      .select($"lang" +: srcs.map(v => coalesce(col(v), lit(0L)).as(v)): _*)
      .orderBy($"lang")
  }

  /** Ordered string aggregation — Spark 4's listagg(DISTINCT …) WITHIN
    * GROUP, the reporting-style roll-up (DuckDB: string_agg with ORDER
    * BY). The WITHIN GROUP ordering is what makes the result
    * deterministic and hash-comparable; a bare collect_list would be
    * partition-order-dependent. Only safe when the per-group distinct
    * value set is bounded (here: ≤20 sources) — an unbounded listagg is
    * a driver-row-size accident at 100 TB, which is why the engine's
    * big-cardinality roll-ups (q37, q43) use bounded-heap top-k
    * aggregates instead. */
  def qListAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"lang")
      .agg(
        expr("listagg(DISTINCT source, ',') WITHIN GROUP (ORDER BY source)")
          .as("sources"),
        count(lit(1)).as("n_docs"))
      .orderBy($"lang")
  }

  /** Nested document modeling (q95): roll each order's line items into
    * an ORDERED array of structs — the denormalization a 100 TB lakehouse
    * ships as pre-joined nested tables so downstream readers never pay
    * the orders⋈lineitem shuffle again (the columnar-nested layout of
    * Dremel/parquet repeated groups). Determinism is the trap:
    * collect_list order is partition-dependent, so the array is
    * array_sort'ed on (linenumber) struct order before fingerprinting.
    * Output proves lossless round-trip relationally: per-order item
    * count, quantity sum, and an md5 over the canonically-ordered item
    * string — flattening back (explode) would reproduce the flat join
    * exactly, which the fingerprint certifies engine-portably. */
  def qNestedRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
    val nested = li
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_list(struct(
        $"l_linenumber", $"l_partkey", $"l_quantity"))).as("items"))
    nested.select(
        $"l_orderkey".as("o_orderkey"),
        size($"items").cast("long").as("n_items"),
        round(aggregate($"items", lit(0.0), (acc, it) =>
          acc + it.getField("l_quantity")), 4).as("sum_qty"),
        // floor() on BOTH engines: Spark's cast("long") truncates toward
        // zero while DuckDB's CAST(AS BIGINT) rounds half-to-even — they
        // only agree on whole numbers. floor() is the same function in
        // both, so the serialization stays engine-portable for any
        // non-integral quantity (and loses nothing: the value is floored
        // identically, not rounded differently, on each side).
        md5(concat_ws("|", transform($"items", it =>
          concat_ws(":", it.getField("l_linenumber"),
            it.getField("l_partkey"),
            floor(it.getField("l_quantity")).cast("long"))))).as("items_fp"))
      .orderBy($"o_orderkey")
  }

  /** Referential-integrity audit (q153): the nightly data-quality gate
    * a warehouse runs over every foreign-key edge of the star schema —
    * child rows, distinct FK values, orphan rows (left-anti against the
    * parent key set) and coverage, one row per edge. This is the check
    * that catches a partial parent-table load or a late-arriving-fact
    * window BEFORE a join silently drops rows downstream. Scale shape:
    * each edge is one anti-join count — dimension parents broadcast;
    * the two fact-fact edges shuffle on the join key exactly like the
    * joins they guard — and edges are independent, so the audit
    * parallelizes across the schema. NULL FKs are excluded from the
    * orphan count (a null FK is a modeling choice, not a broken
    * reference) — mirrored as NOT EXISTS in the oracle. */
  def qRiAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def edge(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String): DataFrame = {
      val c = child.select(col(fk).as("k")).filter(col("k").isNotNull)
      val orphans = c.join(parent.select(col(pk).as("k")), Seq("k"),
        "left_anti")
      c.agg(count(lit(1)).as("n_child"),
          countDistinct($"k").as("n_fk_values"))
        .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
        .select(lit(name).as("edge"), $"n_child", $"n_fk_values",
          $"n_orphans",
          // empty child table ⇒ coverage undefined (NULL), not 0/0
          round(lit(1.0) - $"n_orphans".cast("double") /
            when($"n_child" =!= 0, $"n_child"), 4)
            .as("coverage"))
    }
    Seq(
      edge("customer->nation", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey"),
      edge("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"),
      edge("lineitem->part", Tables.lineitem(s, dir), "l_partkey",
        Tables.part(s, dir), "p_partkey"),
      edge("lineitem->supplier", Tables.lineitem(s, dir), "l_suppkey",
        Tables.supplier(s, dir), "s_suppkey"),
      edge("nation->region", Tables.nation(s, dir), "n_regionkey",
        Tables.region(s, dir), "r_regionkey"),
      edge("orders->customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"),
      edge("supplier->nation", Tables.supplier(s, dir), "s_nationkey",
        Tables.nation(s, dir), "n_nationkey"),
    ).reduce(_.unionByName(_)).orderBy($"edge")
  }

  /** Join-cardinality estimator audit (q193): for each star-schema join
    * edge, the textbook CBO estimate |A|·|B| / max(ndv_A, ndv_B) (the
    * uniform-frequency + containment assumption every Selinger-lineage
    * optimizer ships, Spark's CBO included) next to the TRUE output
    * size Σ_k cA(k)·cB(k) — the audit that tells you WHICH joins the
    * optimizer will mis-plan (skewed keys make the uniform estimate
    * collapse, and a 100× under-estimate is how a broadcast-side OOM or
    * a catastrophic join order gets picked at 100 TB). Scale shape: per
    * edge, two map-side-combined groupBy counts collapse each side to
    * its key histogram (|keys| rows), the histograms join on the key
    * (dimension side broadcasts), and one sum folds the products — the
    * corpus is never joined against itself, so the audit costs two
    * aggregates per edge regardless of data volume. */
  def qJoinEstimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def edge(name: String, a: DataFrame, ak: String,
        b: DataFrame, bk: String): DataFrame = {
      val ha = a.select(col(ak).as("k")).filter($"k".isNotNull)
        .groupBy($"k").agg(count(lit(1)).as("ca"))
      val hb = b.select(col(bk).as("k")).filter($"k".isNotNull)
        .groupBy($"k").agg(count(lit(1)).as("cb"))
      val sides = ha.agg(sum($"ca").as("rows_a"),
          count(lit(1)).as("ndv_a"))
        .crossJoin(broadcast(hb.agg(sum($"cb").as("rows_b"),
          count(lit(1)).as("ndv_b"))))
      val actual = ha.join(hb, "k")
        .agg(coalesce(sum($"ca" * $"cb"), lit(0L)).as("actual"))
      sides.crossJoin(broadcast(actual))
        .select(lit(name).as("edge"), $"rows_a", $"rows_b",
          $"ndv_a", $"ndv_b",
          round($"rows_a" * $"rows_b" /
            greatest($"ndv_a", $"ndv_b").cast("double"), 4)
            .as("est_uniform"),
          $"actual",
          round($"actual" / ($"rows_a" * $"rows_b" /
            greatest($"ndv_a", $"ndv_b").cast("double")), 4)
            .as("actual_over_est"))
    }
    Seq(
      edge("lineitem-orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"),
      edge("lineitem-part", Tables.lineitem(s, dir), "l_partkey",
        Tables.part(s, dir), "p_partkey"),
      edge("orders-customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"),
      edge("events-user-self", Tables.events(s, dir), "user_id",
        Tables.events(s, dir), "user_id"),
    ).reduce(_.unionByName(_)).orderBy($"edge")
  }

  /** Explicit GROUPING SETS (q197): the general form completing the
    * rollup (q8) / cube (q77) trio — exactly the four aggregation
    * levels a release report needs ((lang, source), lang-only,
    * source-only, grand total) WITHOUT cube's 2ⁿ explosion when only
    * some levels matter. One input scan with a 4-way Expand (the same
    * physical shape as rollup/cube, sized by the requested sets, not
    * 2ⁿ); grouping flags disambiguate aggregated-NULL from data-NULL
    * and lead the sort so null ordering conventions never diverge
    * across engines (q8's discipline). */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupingSets(
        Seq(Seq($"lang", $"source"), Seq($"lang"), Seq($"source"), Seq()),
        $"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("chars"),
        grouping($"lang").cast("int").as("g_lang"),
        grouping($"source").cast("int").as("g_source"))
      .orderBy($"g_lang", $"g_source", $"lang", $"source")
  }

  /** q330's band half-width: documents within ±5 chars pair. */
  private val BandEps = 5L

  /** Band join (q330) — the numeric theta join |x_a − x_b| ≤ ε,
    * written NAIVELY: pairing every cross-source document whose
    * lengths differ by ≤ ε, as a plain theta join with no equi keys —
    * exactly the query a user writes, and the plan Spark answers with
    * BroadcastNestedLoopJoin (the plan that dies first at scale). The
    * engine's `BandJoinRule` optimizer rule (graft.plans — the
    * TopKWindowRule pattern) rewrites it to the classic bucketed band
    * join (DeWitt et al. 1991): probe keys on its ⌊x/(ε+1)⌋ bucket,
    * build explodes to bucket ±1, the theta predicate runs as the
    * EQUI join's residual — shuffle on the bucket key, candidate
    * volume ∝ band density, each true pair met exactly once (the
    * probe's single bucket appears once among the build row's three).
    * PlanSpec pins zero BNLJ in this query's optimized plan; rounds
    * ≤ 11 built the same shape BY HAND here — the rule moves the
    * rewrite into the optimizer where every naive spelling gets it.
    * The aggregate reports per source pair the band-pair count and
    * the mean |Δ| — the "how much near-duplicate-length mass sits
    * across sources" profile. Oracle: DuckDB runs the same plain
    * theta join (affordable at oracle scale) — the hash match proves
    * rewrite ≡ predicate. */
  def qBandJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars")
    val a = d.select($"doc_id".as("a"), $"source".as("src_a"),
      $"n_chars".as("xa"))
    val b = d.select($"doc_id".as("b"), $"source".as("src_b"),
      $"n_chars".as("xb"))
    a.join(b, $"src_a" < $"src_b" && abs($"xa" - $"xb") <= BandEps)
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("n_pairs"),
        (floor(sum(abs($"xa" - $"xb")).cast("double")
          / count(lit(1)) * 1e4 + 0.5) / 1e4).as("mean_gap"))
      .orderBy($"src_a", $"src_b")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q330_band_join"    -> (qBandJoin _),
    "q197_grouping_sets" -> (qGroupingSets _),
    "q193_join_estimate" -> (qJoinEstimate _),
    "q153_ri_audit"     -> (qRiAudit _),
    "q95_nested_rollup" -> (qNestedRollup _),
    "q1_agg"            -> (q1Agg _),
    "q9_salted_agg"     -> (q9SaltedAgg _),
    "q9b_distinct_agg"  -> (q9bDistinctAgg _),
    "q2_join_revenue"   -> (q2JoinRevenue _),
    "q3_window_topk"    -> (q3WindowTopk _),
    "q4_filter_project" -> (q4FilterProject _),
    "q5_anti_join"      -> (q5AntiJoin _),
    "q6_semi_join"      -> (q6SemiJoin _),
    "q74_salted_join"   -> (qSaltedJoin _),
    "q76_star_join"     -> (qStarJoin _),
    "q77_cube"          -> (qCube _),
    "q78_pivot"         -> (qPivot _),
    "q80_listagg"       -> (qListAgg _),
    "q7_setops"         -> (q7SetOps _),
    "q8_rollup"         -> (q8Rollup _),
  )

  override def oracleSql: Map[String, String] = Map(
    "q330_band_join" ->
      s"""SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  floor(CAST(sum(abs(a.n_chars - b.n_chars)) AS DOUBLE)
        |    / count(*) * 1e4 + 0.5) / 1e4 AS mean_gap
        |FROM documents a JOIN documents b
        |  ON a.source < b.source
        |  AND abs(a.n_chars - b.n_chars) <= $BandEps
        |GROUP BY a.source, b.source
        |ORDER BY src_a, src_b""".stripMargin,
    "q197_grouping_sets" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(GROUPING(lang) AS INTEGER) AS g_lang,
        |  CAST(GROUPING(source) AS INTEGER) AS g_source
        |FROM documents
        |GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,
    // q193: per edge the same two key histograms + product-sum fold
    "q193_join_estimate" -> {
      def eSql(name: String, a: String, ak: String,
          b: String, bk: String): String =
        s"""SELECT '$name' AS edge, rows_a, rows_b, ndv_a, ndv_b,
          |  round(rows_a * rows_b
          |    / CAST(greatest(ndv_a, ndv_b) AS DOUBLE), 4) AS est_uniform,
          |  actual,
          |  round(actual / (rows_a * rows_b
          |    / CAST(greatest(ndv_a, ndv_b) AS DOUBLE)), 4)
          |    AS actual_over_est
          |FROM
          |  (SELECT CAST(count(*) AS BIGINT) AS rows_a,
          |     CAST(count(DISTINCT $ak) AS BIGINT) AS ndv_a
          |   FROM $a WHERE $ak IS NOT NULL),
          |  (SELECT CAST(count(*) AS BIGINT) AS rows_b,
          |     CAST(count(DISTINCT $bk) AS BIGINT) AS ndv_b
          |   FROM $b WHERE $bk IS NOT NULL),
          |  (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS actual
          |   FROM (SELECT $ak AS k, count(*) AS ca FROM $a
          |         WHERE $ak IS NOT NULL GROUP BY 1) ha
          |   JOIN (SELECT $bk AS k, count(*) AS cb FROM $b
          |         WHERE $bk IS NOT NULL GROUP BY 1) hb USING (k))"""
          .stripMargin
      Seq(
        eSql("lineitem-orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        eSql("lineitem-part", "lineitem", "l_partkey", "part", "p_partkey"),
        eSql("orders-customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        eSql("events-user-self", "events", "user_id", "events", "user_id"),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },
    // q153: NOT EXISTS mirrors left-anti's null-safe semantics; each
    // edge block is the same count triple the Spark side folds
    "q153_ri_audit" -> {
      def edgeSql(name: String, child: String, fk: String,
          parent: String, pk: String): String =
        s"""SELECT '$name' AS edge,
          |  count(*) AS n_child,
          |  count(DISTINCT $fk) AS n_fk_values,
          |  CAST(coalesce(sum(CASE WHEN NOT EXISTS
          |    (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)
          |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphans,
          |  round(1.0 - CAST(sum(CASE WHEN NOT EXISTS
          |    (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)
          |    THEN 1 ELSE 0 END) AS DOUBLE)
          |    / nullif(count(*), 0), 4) AS coverage
          |FROM $child c WHERE c.$fk IS NOT NULL""".stripMargin
      Seq(
        edgeSql("customer->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        edgeSql("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edgeSql("lineitem->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        edgeSql("lineitem->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        edgeSql("nation->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        edgeSql("orders->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        edgeSql("supplier->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },
    // q95's oracle needs no nested types at all: the ordered string_agg
    // IS the canonical serialization the Spark side fingerprints
    "q95_nested_rollup" ->
      """SELECT l_orderkey AS o_orderkey,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  md5(string_agg(
        |    CAST(l_linenumber AS VARCHAR) || ':' ||
        |    CAST(l_partkey AS VARCHAR) || ':' ||
        |    CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR), '|'
        |    ORDER BY l_linenumber, l_partkey, l_quantity)) AS items_fp
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q9_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        | round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q9b_distinct_agg" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events,
        | round(sum(DISTINCT value), 4) AS sum_distinct_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q80_listagg" ->
      """SELECT lang,
        |  string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q76_star_join" ->
      s"""SELECT n_name, CAST(count(*) AS BIGINT) AS n_items,
        |  round(CAST(sum($RevSql) AS DOUBLE), 4) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |              AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q77_cube" ->
      """SELECT
        |  CAST(grouping(lang) AS INTEGER) AS g_lang,
        |  CAST(grouping(source) AS INTEGER) AS g_source,
        |  coalesce(lang, 'ALL') AS lang,
        |  coalesce(source, 'ALL') AS source,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents
        |GROUP BY CUBE (lang, source)
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,
    "q78_pivot" ->
      """SELECT lang,
        |  CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS src0,
        |  CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS src1,
        |  CAST(count(*) FILTER (WHERE source = 'src2') AS BIGINT) AS src2,
        |  CAST(count(*) FILTER (WHERE source = 'src3') AS BIGINT) AS src3
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // the oracle is the UNSALTED join — salting must not change results
    "q74_salted_join" ->
      s"""SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
        |  round(CAST(sum($RevSql) AS DOUBLE), 4) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(CAST(sum($PriceSql) AS DOUBLE),4) AS sum_base_price,
        | round(CAST(sum($RevSql) AS DOUBLE),4) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_revenue" ->
      s"""SELECT r_name, n_name,
        | round(CAST(sum($RevSql) AS DOUBLE),4) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q3_window_topk" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,4) AS o_totalprice, rk
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q4_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice*l_discount,4) AS disc_revenue, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q5_anti_join" ->
      """SELECT event_id, user_id, props, round(value,4) AS value
        |FROM events e
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
        |  AND event_type = 'purchase'
        |  AND NOT EXISTS (SELECT 1 FROM events s
        |                  WHERE CAST(s.ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
        |                    AND s.user_id = e.user_id AND s.props = e.props)
        |ORDER BY event_id""".stripMargin,
    "q6_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q7_setops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |     e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |SELECT user_id, 'purchase_only' AS tag FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
        |UNION ALL
        |SELECT user_id, 'both' AS tag FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
        |ORDER BY tag, user_id""".stripMargin,
    "q8_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n_orders,
        | round(sum(o_totalprice),4) AS sum_price,
        | CAST(grouping(o_orderstatus) AS INT) AS g_status,
        | CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin,
  )
}
