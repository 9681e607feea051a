package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: the properties that make these queries
  * survive a 100× scale-up are part of the contract, not an accident —
  * pin them so a refactor can't silently regress the plan shape. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q4: filters and projection push into the parquet scan") {
    val p = plan("q4_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("l_shipdate"), "shipdate range must reach the scan")
    // pruned read schema — only the 5 referenced columns leave the scan
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_tax"),
      s"scan reads too many columns: $readSchema")
  }

  test("q2: dimension joins broadcast, no shuffle on the dim side") {
    val p = plan("q2_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "nation/region must broadcast")
  }

  test("q1: aggregation is partial (map-side combine before the shuffle)") {
    val p = plan("q1_agg")
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, got $hashAggs")
  }

  test("q5: seen-set dedup plans as a real anti join, not a cartesian") {
    val p = plan("q5_anti_join")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q330: naive band theta join plans with zero BNLJ (BandJoinRule)") {
    // q330 is WRITTEN as the plain |xa−xb| ≤ ε theta join a user would
    // type; BandJoinRule must turn it into the bucketed equi join —
    // any BroadcastNestedLoopJoin here is the plan that dies at scale
    val p = plan("q330_band_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "band join must not plan as BNLJ with BandJoinRule installed")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate"), "bucket ±1 explode missing")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "expected an equi join")
  }

  test("q345: naive fractional band join plans with zero BNLJ") {
    val p = plan("q345_value_band")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "fractional band must not plan as BNLJ with BandJoinRule installed")
    assert(p.contains("Generate"), "bucket ±2 explode missing")
  }

  test("q346/q348: outer and semi band joins plan with zero BNLJ") {
    // round-13: the naive LEFT OUTER / LEFT SEMI spellings must go
    // through BandJoinRule's outer/semi paths — a BNLJ outer join is
    // the enrichment plan that dies at scale
    for ((name, joinStr) <- Seq(
        "q346_band_left" -> "LeftOuter", "q348_band_semi" -> "LeftSemi")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name must not plan as BNLJ with BandJoinRule installed")
      assert(p.contains("Generate"), s"$name: bucket explode missing")
      assert(p.contains(joinStr), s"$name: join type must stay $joinStr")
    }
  }

  test("q40: query side broadcasts — corpus side never shuffles") {
    val p = plan("q40_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the ~1% query set must broadcast against the full corpus scan")
    assert(!p.contains("CartesianProduct"))
  }

  // formatted mode prints each operator twice (tree + detail section);
  // count only the "(n) Exchange" detail headers
  private def exchanges(name: String): Int =
    plan(name).linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))

  test("q12b (in-row twin): map-only — the single exchange is the presentation sort") {
    val n = exchanges("q12b_bigrams_inrow")
    info(s"q12b exchanges: $n")
    assert(n == 1, s"in-row bigram chain grew shuffles: $n")
  }

  test("q12 flagship (shuffle form): pinned at 3 exchanges (pair agg, window+regroup, sort)") {
    val n = exchanges("q12_bigrams_topk")
    info(s"q12 exchanges: $n")
    // pinned from the reviewed plan — change deliberately, not by accident
    assert(n == 3, s"bigram shuffle chain changed: $n")
  }

  test("q109 dedup apply: losers broadcast into an anti join, corpus never shuffles") {
    val p = plan("q109_dedup_apply")
    assert(p.contains("LeftAnti"), "apply must be an anti join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "the loser frame must broadcast — shuffling the corpus to drop " +
        "a tiny loser set is the 100 TB anti-pattern")
    assert(!p.contains("CartesianProduct"))
  }

  test("q111 manifest: every gate frame broadcasts, one corpus aggregate") {
    val p = plan("q111_training_manifest")
    // each gate is a LeftOuter broadcast join in the tree section
    val gates = p.linesIterator
      .count(l => l.contains("BroadcastHashJoin LeftOuter") && l.contains("+-"))
    assert(gates >= 3,
      s"exact/near/contam gate frames must all broadcast, saw $gates")
    assert(!p.contains("SortMergeJoin"), "no gate may shuffle the corpus")
    assert(!p.contains("CartesianProduct"))
  }

  test("q105 epoch shuffle: per-shard windows, no single-partition sort") {
    val p = plan("q105_epoch_shuffle")
    // the permutation must never funnel through one partition: the
    // window partitions by shard (hashpartitioning on shard), and no
    // 'Window' node runs with an empty partition spec
    assert(p.contains("hashpartitioning(shard"),
      "rank window must partition by shard")
  }

  test("q114 DSIR select: the corpus-sized window partitions by bucket") {
    val p = plan("q114_dsir_select")
    // the per-doc cumulative sum must run inside grid buckets — a
    // corpus-sized window with an empty partition spec would be the
    // single-partition global cumsum this query exists to avoid (the
    // only permitted empty-spec window is the 16-row offset frame)
    assert(p.contains("hashpartitioning(bucket"),
      "local prefix-sum window must partition by the weight-grid bucket")
  }

  test("q117 bucketed join: sort-merge with the ONLY exchange above the join") {
    // both sides are bucketed on the join key: the fact-to-fact join
    // itself must read bucket files straight into SortMergeJoin — the
    // one Exchange allowed in the whole plan is the groups-sized final
    // aggregate. (BucketingSpec proves the raw mechanics; this pins the
    // shipped query.)
    val df = SparkEntry.queries("q117_bucket_join")(spark, sf)
    df.collect() // AQE-final plan
    // AQE's toString prints the final plan AND the initial plan — keep
    // only the final section or every operator double-counts
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("SortMergeJoin"),
      s"merge hint must hold through AQE:\n${p.take(1500)}")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, // agg hashpartitioning + presentation range sort
      s"bucketed join must not shuffle its inputs ($exchanges exchanges):\n$p")
    assert(p.contains("Bucketed: true"),
      "scans must read bucket files directly (bucketed read active)")
  }

  test("q143 band index at rest: bucket-co-located probe, no exchange under the join") {
    // the index table and its probe side (a filter of the same table)
    // are both bucketed on the join keys (band_id, band_val): the band
    // probe must read bucket files straight into SortMergeJoin — every
    // Exchange in the plan sits ABOVE the join (candidate dedup, rank
    // window, presentation sort), never under it
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = SparkEntry.queries("q143_band_index")(spark, sf)
    df.collect() // AQE-final plan
    // AQE wraps materialized stages in leaf QueryStageExec nodes, so a
    // plain collect() never sees inside them — descend explicitly
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val all = flatten(df.queryExecution.executedPlan)
    val smjs = all.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty,
      s"merge hint must hold through AQE:\n${all.head}")
    val underJoin = smjs.flatMap(_.children.flatMap(flatten).collect {
      case e if e.nodeName.contains("Exchange") => e.nodeName
    })
    assert(underJoin.isEmpty,
      s"band probe must not shuffle its bucketed inputs: $underJoin")
    assert(all.exists(_.toString.contains("Bucketed: true")),
      "scans must read bucket files directly (bucketed read active)")
  }

  test("q143 equals q41: the at-rest index changes the plan, not the answer") {
    val live = SparkEntry.queries("q41_lsh_ann")(spark, sf).collect()
    val atRest = SparkEntry.queries("q143_band_index")(spark, sf).collect()
    assert(live.map(_.toString).toSeq === atRest.map(_.toString).toSeq)
  }

  test("driver smoke contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q76 star join: every dim broadcasts, filters reach the scans") {
    val p = plan("q76_star_join")
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 4, s"expected >=4 broadcast dim joins, got $bhj")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "fact table must not shuffle for any dim join")
    assert(p.contains("o_orderdate"), "date range must push toward the scan")
  }

  // formatted explain prints each scan twice (tree + numbered detail
  // header) — count the "(N) Scan parquet" detail headers only
  private def scanCount(p: String): Int =
    p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))

  test("q77 cube: single Expand feeds one aggregate pass") {
    val p = plan("q77_cube")
    assert(p.contains("Expand"), "cube must plan as Expand, not a union")
    // one scan of documents however many grouping sets
    val scans = scanCount(p)
    assert(scans == 1, s"cube re-read the input: $scans scans")
  }

  test("q78 pivot with explicit values: no driver collect of pivot keys") {
    // an explicit value list keeps pivot a pure aggregate; the plan must
    // not contain a second job's scan for distinct keys (single scan)
    val p = plan("q78_pivot")
    val scans = scanCount(p)
    assert(scans == 1, s"pivot scanned input $scans times")
  }

  test("q269 pad packing: shard-partitioned fold, no Window anywhere") {
    val p = plan("q269_pad_packing")
    // the sequential fill must stream per shard (one exchange on the
    // shard key, secondary sort inside partitions) — a Window operator
    // here would mean the fold regressed to a per-shard single-reducer
    // running aggregate
    assert(p.contains("hashpartitioning(shard"),
      "packing fold must repartition on the md5 shard")
    assert(!p.contains("Window"),
      "pad packing must fold over sorted partitions, not a window")
  }

  test("q270 rendezvous: the HRW argmax stays in-row (no Generate fan-out)") {
    val p = plan("q270_rendezvous_shards")
    // the doc×shard candidate grid must never materialize — argmax over
    // the 9-struct array is a scalar expression; an explode here would
    // be a 9× corpus fan-out the in-row form exists to avoid
    assert(!p.contains("Generate"),
      "HRW shard choice must be an in-row array_max, not an explode")
  }

  test("vocab-keyed frames carry no forced broadcast hint (q172/q199/q228/q93/q160)") {
    // The scale contract: explicit broadcast() is reserved for frames
    // bounded BY CONSTRUCTION (≤ V+1-row folded vocabs, grids,
    // scalars). Frames keyed on an unbounded vocabulary — shingle-df
    // tables, bigram models, PPMI marginals — must stay unhinted so
    // the planner can degrade to a shuffle join instead of OOMing on a
    // forced broadcast at corpus scale. A hint on a frame whose
    // SINGLE-ROW output is an aggregate over the vocab (the `n`/`tot`
    // scalars) is fine; one keyed BY the vocab term/shingle is not.
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ResolvedHint}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    // minGroup: the smallest grouping-key arity that marks a frame as
    // vocab-scaling in that query. The shingle/PPMI queries bound
    // NOTHING by fold, so any grouped hint (arity ≥ 1) is a violation;
    // q93/q160's 1-key context/continuation tables ARE fold-bounded
    // (≤ V+1 rows) and legitimately hinted — only their 2-key
    // (prev, term) bigram tables scale as V².
    def vocabKeyedHints(name: String, minGroup: Int): Seq[LogicalPlan] = {
      val analyzed = SparkEntry.queries(name)(spark, sf)
        .queryExecution.analyzed
      analyzed.collect {
        // the OUTERMOST aggregate under the hint determines the hinted
        // frame's row count (a scalar agg OVER a grouped agg is still
        // one row — only the top one counts)
        case h: ResolvedHint if h.child
          .collectFirst { case a: Aggregate => a }
          .exists(_.groupingExpressions.length >= minGroup) => h
      }
    }
    Seq("q172_sparse_cosine" -> 1, "q199_prefix_join" -> 1,
        "q228_ppmi_sim" -> 1, "q93_bigram_nll" -> 2,
        "q160_kn_bigram" -> 2, "q129_pmi_collocations" -> 1,
        "q213_assoc_rules" -> 1).foreach { case (q, minGroup) =>
      val bad = vocabKeyedHints(q, minGroup)
      assert(bad.isEmpty,
        s"$q: forced broadcast of a grouped (vocab-scaling) frame:\n" +
          bad.map(_.simpleString(2)).mkString("\n"))
    }
  }

  test("q41: query frame is checkpointed — one parquet scan in the join plan") {
    // chunkedBroadcastJoin materializes the small query frame via eager
    // localCheckpoint before sizing it: without that, the count() AND
    // every chunk's broadcast branch each re-derived the query side
    // from the full corpus scan. Post-fix the executed plan reads the
    // corpus parquet ONCE and the broadcast side from the checkpoint
    // (Scan ExistingRDD), never parquet a second time.
    val df = SparkEntry.queries("q41_lsh_ann")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val parquetScans = "Scan parquet|FileScan parquet".r.findAllIn(p).length
    assert(parquetScans == 1,
      s"expected exactly one parquet scan in the q41 join plan, got " +
        s"$parquetScans")
    assert(p.contains("ExistingRDD"),
      "query side must read the localCheckpoint, not re-derive")
  }

  test("whole-stage codegen covers the text chain (no UDFs in q10-q17)") {
    // AQE reveals codegen spans only in the final (executed) plan
    val df = SparkEntry.queries("q10_clean_text")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("))
    assert(!p.contains("BatchEvalPython"))
  }

  test("AQE splits a skewed join partition (the no-salt skew path)") {
    // q9/q74 salt by hand; the OTHER skew tool the scale notes rely on
    // is AQE's runtime skew-join split. Prove it actually fires: a
    // 90%-hot-key join under sort-merge, thresholds scaled to test data
    // — the executed plan must carry the skew=true marker.
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, when}
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val fact = spark.range(40000)
        .select((when($"id" % 10 =!= 0, lit(0L)).otherwise($"id")).as("k"),
          $"id".as("payload"))
      val dim = spark.range(40000).select($"id".as("k"), lit("d").as("tag"))
      val joined = fact.join(dim, "k")
      // collect() (not count()) so THIS queryExecution runs and AQE
      // finalizes it — count() plans a separate aggregate query
      assert(joined.collect().length == 40000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the hot-key partition as skewed:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
