package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Contract hardening (round-1 verdict #3/#6/#7):
  *  - the JSON line is the ONLY stdout this JVM writes — everything else
  *    (Spark launch chatter, stray printlns) is redirected to stderr;
  *  - the same line is also written to bench_out.json in the cwd so the
  *    driver can recover it even if the sbt wrapper pollutes stdout;
  *  - queries are materialized through the noop sink, not count(), so
  *    Catalyst can't prune unreferenced projections and under-measure
  *    pure-projection queries.
  */
object Bench {

  /** Render the stdout JSON line. The driver captures only the LAST
    * ~2000 chars of stdout and sbt appends its own "[success] Total
    * time" line after ours, so the whole line must fit in well under
    * 1900 chars or the driver records `parsed: null` (the r01/r02
    * failure). At 145 queries the old per-query line hit 1776/1800
    * chars (round-5 verdict #1), so the captured line now carries
    * per-FAMILY rollups (bounded by the module count, ~12, not the
    * query count) plus the 5 slowest queries; the full per-query map
    * is written to bench_out.json alongside. Kept as a pure function
    * so BenchLineSpec can pin the length budget without running
    * Spark. */
  /** Plan-comparison twins (in-row variants of q12/q18): timed under a
    * separate "twins" key and excluded from the headline total, so the
    * headline reflects the DEFAULT plans a user would run (round-3
    * verdict #7). */
  private[graft] val TwinQueries: Set[String] =
    Set("q12b_bigrams_inrow", "q18b_keywords_inrow")

  private def shortKey(full: String): String = full.takeWhile(_ != '_')

  private def fmt(v: Double): String =
    if (v < 0) "-1" else BigDecimal(v).setScale(
      if (v >= 100) 0 else if (v >= 10) 1 else 2,
      BigDecimal.RoundingMode.HALF_UP).toString
  private def fmt3(v: Double): String =
    if (v < 0) "-1" else BigDecimal(v).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toString

  private def obj(m: Seq[(String, Double)]): String =
    m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")

  private[graft] def renderLine(results: Map[String, Double],
                                sfDir: String,
                                warm: Map[String, Double] = Map.empty)
      : String = {
    val (twins, main) = results.partition(kv => TwinQueries(kv._1))
    val fams = SparkEntry.families
    // Unknown names (shouldn't happen; belt for synthetic spec input)
    // roll into "other" rather than being dropped from the total.
    val byFamily = main.filter(_._2 >= 0).toSeq
      .groupBy { case (n, _) => fams.getOrElse(n, "other") }
      .map { case (f, kvs) => f -> kvs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val slowFull = main.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(5)
    val slowest = slowFull
      .map { case (n, v) => shortKey(n) -> v }.sortBy(_._1)
    // warm figures for the slowest rows only (bounded at 5 entries —
    // the line budget): a staged-chain head like q285 pays its
    // family's staging in BOTH interleaved passes since the per-family
    // cache release, so its min-of-2 is staging-inclusive; the warm
    // column is the same query re-run with the stage cache live, i.e.
    // the query's own cost — read staging vs query cost separately.
    val slowWarm = slowFull.flatMap { case (n, _) =>
      warm.get(n).map(shortKey(n) -> _) }.sortBy(_._1)
    val failed = results.collect { case (k, v) if v < 0 => shortKey(k) }
      .toSeq.sorted
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = fmt3(main.values.filter(_ >= 0).sum)
    val sf = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val note = "sec; min of 2 passes; warm=cache-live re-run; " +
      "per-query maps in bench_out.json; -1=failed; twins excl"
    s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${main.size},"queries":${obj(byFamily)},"slowest":${obj(slowest)},"slowest_warm":${obj(slowWarm)},"twins":${obj(twins.toSeq.sortBy(_._1).map { case (k, v) => shortKey(k) -> v })},"failed":$failedJson,"sf":"$sf","note":"$note"}"""
  }

  /** Parse the per-query map out of a PRIOR bench_out.json (the file
    * this run is about to overwrite). Tolerant by construction — a
    * missing/garbled file just yields an empty map and no delta
    * section. Scoped to the `"queries":{...}` object so warm/twins
    * entries don't alias. */
  private[graft] def parsePrevQueries(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    if (start < 0) Map.empty
    else {
      val body = json.substring(start + 11, json.indexOf('}', start))
      val Entry = "\"([^\"]+)\":(-?[0-9.]+)".r
      Entry.findAllMatchIn(body)
        .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble)
          .toOption)
        .toMap
    }
  }

  /** Round-over-round self-flagging (round-12 verdict #4): queries
    * whose min moved > 25% AND > 0.5 s against the previous
    * bench_out.json — the carried-suite drift detector, so a +10%
    * diffuse drift or a single regressed query is named in the
    * artifact instead of discovered by diffing rounds by hand. */
  private[graft] def movers(prev: Map[String, Double],
                            now: Map[String, Double])
      : Seq[(String, Double, Double)] =
    now.toSeq.collect {
      case (n, v) if v >= 0 && prev.get(n).exists(p => p >= 0 &&
          math.abs(v - p) > 0.5 && math.abs(v - p) > 0.25 * p) =>
        (n, prev(n), v)
    }.sortBy { case (_, p, v) => -(math.abs(v - p)) }

  /** Full per-query detail for bench_out.json — same shape the driver
    * used to get on stdout (full names, millisecond precision), with
    * the family rollups appended for convenience. Unbounded length is
    * fine here: it's a file, not the captured stdout tail. */
  private[graft] def renderDetail(results: Map[String, Double],
                                  sfDir: String,
                                  warm: Map[String, Double] = Map.empty,
                                  prev: Map[String, Double] = Map.empty)
      : String = {
    val (twins, main) = results.partition(kv => TwinQueries(kv._1))
    def objFull(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = fmt3(main.values.filter(_ >= 0).sum)
    val sf = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val moved = movers(prev, main).map { case (n, p, v) =>
      "\"" + n + "\":[" + fmt3(p) + "," + fmt3(v) + "]"
    }.mkString("{", ",", "}")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":${objFull(main)},"warm":${objFull(warm)},"twins":${objFull(twins)},"moved_vs_prev":$moved,"failed":$failedJson,"sf":"$sf","note":"sec; min of 2 passes; warm=cache-live re-run of >1s queries; moved_vs_prev=[prev,now] where delta >25% and >0.5s vs prior bench_out.json; -1=failed; twins excl"}"""
  }

  def main(args: Array[String]): Unit = {
    val stdout = System.out
    System.setOut(System.err) // everything but the final JSON → stderr
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      org.apache.spark.sql.GraftBridge.installOptimizerRule(s,
        graft.plans.TopKWindowRule)
      org.apache.spark.sql.GraftBridge.installOptimizerRule(s,
        graft.plans.BandJoinRule)
      org.apache.spark.sql.GraftBridge.installOptimizerRule(s,
        graft.plans.IntervalJoinRule)
      org.apache.spark.sql.GraftBridge.installStrategy(s,
        graft.plans.AsOfJoinStrategy)
      // Warm the JVM/codegen paths once so the first timed query doesn't
      // absorb JIT + classloading cost (measured ~4s on the first query).
      try {
        s.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag").count()
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => }
      s
    }
    var spark = newSession()
    // Measurement protocol (round-3 verdict #1): this host has bursty
    // multi-minute CPU-steal stalls, and back-to-back runs of one query
    // let a single stall window swallow EVERY sample of that query
    // (r03: q21 reported 70.3s vs 0.89s re-profiled, code unchanged).
    // Fix: two full INTERLEAVED passes over the whole suite — the two
    // samples of any query are separated by an entire suite pass
    // (minutes), far wider than a stall window — with per-query min
    // across passes. Queries whose min is STILL above StallSuspectSec
    // after both passes get one final retry at the end, so a stall
    // landing on the same query in both passes can't survive either.
    val StallSuspectSec = 5.0
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }
    // Each pass walks the suite FAMILY BY FAMILY and releases that
    // family's staged SessionCache frames as soon as its last query
    // finishes (round-10 verdict #2b): with 300+ queries in one JVM the
    // accumulated staged frames otherwise pile up for the whole run —
    // the late-suite cache pressure that let r10 record q186 at 13.6 s
    // through min-of-3 while a fresh profile measured 2.5 s. Module
    // caches are family-private, so nothing is dropped that a LATER
    // family would reuse; the next pass re-stages, which is the same
    // cost the family's first query pays in any fresh session.
    val fams = SparkEntry.families
    val byFamily = SparkEntry.queries.toSeq.sortBy(_._1)
      .groupBy { case (n, _) => fams.getOrElse(n, "other") }
      .toSeq.sortBy(_._1)
    // Warm column (round-11 verdict #2): with the per-family cache
    // release, a staged-chain head (q285's suffix build, q199's prefix
    // truth set, …) re-pays its family staging in BOTH interleaved
    // passes, so min-of-2 can never show a warm number for it — q285
    // read 5.81 s while its warm cost is 0.22 s. After a family's
    // pass-2 queries are timed, its over-threshold queries re-run ONCE
    // with the family cache still live; that warm figure is recorded
    // separately (never min'd into the headline), so staging cost and
    // query cost read as two columns instead of one conflated number.
    val WarmThresholdSec = 1.0
    def fullPass(recordWarm: Boolean)
        : (Map[String, Option[Double]], Map[String, Double]) = {
      val warmB = Map.newBuilder[String, Double]
      val timed = byFamily.flatMap { case (_, qs) =>
        val t = qs.map { case (n, fn) => n -> once(n, fn) }
        if (recordWarm) {
          val tm = t.toMap
          for ((n, fn) <- qs; v <- tm(n) if v > WarmThresholdSec;
               w <- once(n, fn)) {
            // warm-inversion retry (round 14): warm SLOWER than its
            // own cold is physically impossible for a cache-live
            // re-run unless the host stole the sample (r13's final
            // bench shipped q186 warm=27.7 s vs cold=12.0 s and the
            // figure was pure contention — fresh profiles read flat).
            // One immediate re-measure, min taken, so a single noisy
            // sample can't land in the artifact unchallenged.
            val w2 = if (w > v) once(n, fn).fold(w)(math.min(_, w))
              else w
            warmB += n -> w2
          }
        }
        graft.operators.SessionCache.releaseAll(spark)
        t
      }.toMap
      (timed, warmB.result())
    }
    val (pass1, _) = fullPass(recordWarm = false)
    val (pass2, warm) = fullPass(recordWarm = true)
    // Stall-suspect retry runs in a FRESH session in a fresh context
    // (round-10 verdict #2a): stall windows correlate within a JVM's
    // cache/GC state, so re-measuring suspects under the state that
    // produced the suspicion can confirm a phantom. The restart drops
    // every cached block; suspects re-stage exactly like a profile run.
    val suspects = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (n, _) =>
        val s = pass1(n).toSeq ++ pass2(n).toSeq
        s.nonEmpty && s.min > StallSuspectSec
    }
    val retried: Map[String, Option[Double]] = if (suspects.isEmpty) Map.empty
    else {
      spark.stop()
      spark = newSession()
      suspects.map { case (n, fn) => n -> once(n, fn) }.toMap
    }
    // A failed query must not masquerade as a fast success (round-2
    // ADVICE): it reports value -1 and lands in the "failed" list.
    val results: Map[String, Double] =
      SparkEntry.queries.keys.toSeq.map { name =>
        val samples = pass1(name).toSeq ++ pass2(name).toSeq ++
          retried.getOrElse(name, None).toSeq
        name -> (if (samples.isEmpty) -1.0 else samples.min)
      }.toMap
    val line = renderLine(results, sfDir, warm)
    stdout.println(line)
    stdout.flush()
    val prev = try {
      val p = Paths.get("bench_out.json")
      if (Files.exists(p)) parsePrevQueries(Files.readString(p))
      else Map.empty[String, Double]
    } catch { case _: Throwable => Map.empty[String, Double] }
    try Files.writeString(Paths.get("bench_out.json"),
      renderDetail(results, sfDir, warm, prev) + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
