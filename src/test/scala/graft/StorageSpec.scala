package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{concat, lit, max, min, sum}
import graft.operators.{BloomJoin, StorageQueries}
import graft.sources.{Tables, UpsertSink}

class StorageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("orc round-trip: real .orc files on disk, row count preserved") {
    val got = StorageQueries.qOrcRoundtrip(spark, sf).collect()
    assert(got.length == Tables.supplier(spark, sf).count())
    val outDir = new java.io.File("target/graft-fmt/sf0.001-supplier-orc")
    assert(outDir.listFiles().exists(_.getName.endsWith(".orc")),
      "round-trip must write ORC files, not a renamed parquet")
  }

  test("bloom pre-filter prunes rows but never changes the join result") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = StorageQueries.qBloomJoin(spark, sf).collect().toSeq
    // the same join without the bloom stage
    val cust = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ords = Tables.orders(spark, sf)
      .join(cust, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_orderpriority")
    val line = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val plain = line.join(ords, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority").collect().toSeq
    assert(got == plain && got.nonEmpty)
    // and the filter genuinely prunes: |prefiltered| is far below the
    // full table, but still covers every true match (+ false positives)
    val pre = BloomJoin.preFilter(line, $"l_orderkey",
      ords.select($"o_orderkey"), $"o_orderkey", 1000000L).count()
    val full = line.count()
    val exact = line.join(ords.select($"o_orderkey"),
      $"l_orderkey" === $"o_orderkey", "left_semi").count()
    assert(pre < full, s"bloom filter pruned nothing ($pre of $full)")
    assert(pre >= exact, "bloom filter dropped a true match")
  }

  test("bloom build side runs as a scalar subquery, not a collect") {
    import spark.implicits._
    val line = Tables.lineitem(spark, sf).select($"l_orderkey")
    val keys = Tables.orders(spark, sf).select($"o_orderkey").limit(100)
    val df = BloomJoin.preFilter(line, $"l_orderkey", keys, $"o_orderkey", 1000L)
    val p = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(p.contains("might_contain"), s"no bloom probe in plan:\n$p")
    assert(p.contains("scalar-subquery") || p.contains("scalarsubquery"),
      s"bloom sketch not fed via scalar subquery:\n$p")
  }

  test("upsert on disk: latest version wins, re-upsert is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-upsert").toString + "/t"
    val v0 = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L))
      .toDF("id", "payload", "version")
    UpsertSink.upsert(v0, dir, Seq("id"), "version")
    val v1 = Seq((2L, "B", 1L), (4L, "d", 1L)).toDF("id", "payload", "version")
    UpsertSink.upsert(v1, dir, Seq("id"), "version")
    def state() = spark.read.parquet(dir)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    val expected = Seq((1L, "a", 0L), (2L, "B", 1L), (3L, "c", 0L),
      (4L, "d", 1L))
    assert(state() == expected)
    // stale batch loses: replaying v0 must not roll anything back
    UpsertSink.upsert(v0, dir, Seq("id"), "version")
    assert(state() == expected)
  }

  test("partitioned upsert rewrites only touched partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-part-upsert").toString + "/t"
    val v0 = Seq((1L, "a", 0L, "en"), (2L, "b", 0L, "en"),
      (3L, "c", 0L, "de")).toDF("id", "payload", "version", "lang")
    UpsertSink.upsertPartitioned(v0, dir, Seq("id"), "version", "lang")
    val deBefore = new java.io.File(s"$dir/lang=de").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified, f.length)).toSeq
    // update only the en partition
    val v1 = Seq((2L, "B", 1L, "en"), (4L, "d", 1L, "en"))
      .toDF("id", "payload", "version", "lang")
    UpsertSink.upsertPartitioned(v1, dir, Seq("id"), "version", "lang")
    val deAfter = new java.io.File(s"$dir/lang=de").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified, f.length)).toSeq
    assert(deAfter == deBefore, "untouched partition files must be bit-identical")
    val state = spark.read.parquet(dir)
      .select($"id", $"payload", $"version", $"lang")
      .orderBy("id").as[(Long, String, Long, String)].collect().toSeq
    assert(state == Seq((1L, "a", 0L, "en"), (2L, "B", 1L, "en"),
      (3L, "c", 0L, "de"), (4L, "d", 1L, "en")))
  }

  test("partition-pruned scan reads only the filtered partition") {
    val df = StorageQueries.qPartitionPruning(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition filter in scan:\n${plan.take(2000)}")
    assert(df.count() > 0)
  }

  test("streaming upsert: micro-batches merge, late stale rows lose") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-upsert").toString + "/t"
    val src = MemoryStream[(Long, String, Long)]
    val q = src.toDF().toDF("id", "payload", "version")
      .writeStream
      .foreachBatch(UpsertSink.foreachBatchUpserter(dir, Seq("id"), "version"))
      .outputMode("update").start()
    try {
      src.addData((1L, "a", 0L), (2L, "b", 0L))
      q.processAllAvailable()
      // batch 2: update id=2, insert id=3, replay a STALE id=1
      src.addData((2L, "B", 1L), (3L, "c", 1L), (1L, "stale", -1L))
      q.processAllAvailable()
      val state = spark.read.parquet(dir)
        .orderBy("id").as[(Long, String, Long)].collect().toSeq
      assert(state == Seq((1L, "a", 0L), (2L, "B", 1L), (3L, "c", 1L)))
    } finally q.stop()
  }

  test("csv read enforces the schema instead of inferring") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.csv"),
      "id,n\n1,10\n2,not_a_number\n3,30\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, n INT")
    // PERMISSIVE: the malformed cell nulls out, the row survives
    val rows = spark.read.schema(schema).option("header", "true")
      .csv(dir).orderBy("id").as[(Option[Int], Option[Int])]
      .collect().toSeq
    assert(rows == Seq((Some(1), Some(10)), (Some(2), None),
      (Some(3), Some(30))))
    // FAILFAST: the same file is a hard error, not a silent retype
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).option("header", "true")
        .option("mode", "FAILFAST").csv(dir).collect()
    }
  }

  test("compaction: file-count math holds and key ranges stay disjoint") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    spark.range(0, 20000).select($"id", concat(lit("row-"), $"id").as("s"))
      .repartition(32).write.parquet(in)
    val fs = new Path(in).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(p: String) = fs.listStatus(new Path(p))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val inBytes = files(in).map(_.getLen).sum
    val target = 64L * 1024
    val n = graft.sources.Compaction.compact(spark, in, out, target, "id")
    assert(n == ((inBytes + target - 1) / target).toInt)
    val outFiles = files(out)
    assert(outFiles.length == n && n < 32,
      s"expected $n compacted files, got ${outFiles.length}")
    // compaction is a pure layout change
    assert(spark.read.parquet(out).count() == 20000)
    assert(spark.read.parquet(out).agg(sum($"id")).head.getLong(0) ==
      (0L until 20000L).sum)
    // range layout: per-file [min,max] id intervals must not overlap —
    // that is what keeps parquet footer-stats data skipping alive
    val ranges = outFiles.map { st =>
      val r = spark.read.parquet(st.getPath.toString)
        .agg(min($"id"), max($"id")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping file ranges: $aMax >= $bMin")
      case _ =>
    }
  }

  test("zorder: interleave is invertible and file layout tightens both dims") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // invertibility: de-interleaving the Morton code recovers both inputs
    val docs = StorageQueries.qZOrder(spark, sf)
    val bad = docs.filter(
      graft.sources.ZOrder.zval($"lang_code", $"n_chars", 10) =!= $"zval")
      .count()
    assert(bad == 0)
    val rows = docs.select($"zval", $"lang_code", $"n_chars")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (z, a, b) =>
      val (ra, rb) = (0 until 10).foldLeft((0L, 0L)) { case ((x, y), i) =>
        (x | (((z >> (2 * i)) & 1L) << i), y | (((z >> (2 * i + 1)) & 1L) << i))
      }
      assert(ra == a && rb == b, s"z=$z did not invert to ($a,$b)")
    }
    // layout: range-partition by zval into 4 files; per-file zval ranges
    // disjoint, and the mean per-file n_chars span sits below the global
    // span — the two-dimensional tightening single-key layout can't give
    val base =
      java.nio.file.Files.createTempDirectory("zorder").toString + "/out"
    docs.repartitionByRange(4, $"zval").sortWithinPartitions($"zval")
      .write.parquet(base)
    val perFile = spark.read.parquet(base)
      .groupBy(input_file_name().as("f"))
      .agg(min($"zval").as("zmin"), max($"zval").as("zmax"),
        (max($"n_chars") - min($"n_chars")).as("cspan"))
      .collect()
    assert(perFile.length == 4)
    val zranges = perFile.map(r => (r.getAs[Long]("zmin"), r.getAs[Long]("zmax")))
      .sortBy(_._1)
    zranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping zval file ranges: $aMax >= $bMin")
      case _ =>
    }
    val globalSpan = docs.agg(max($"n_chars") - min($"n_chars"))
      .head.getLong(0).toDouble
    val meanSpan = perFile.map(_.getAs[Long]("cspan")).sum.toDouble / 4
    assert(meanSpan < globalSpan,
      s"z-order layout did not tighten n_chars: $meanSpan vs $globalSpan")
  }

  test("scd2: one open row per key, closed rows chain by version") {
    import spark.implicits._
    val h = StorageQueries.qScd2(spark, sf)
    val open = h.filter($"is_current")
    // every doc has exactly one current row
    assert(open.count() == Tables.documents(spark, sf).count())
    // updated docs have a closed v0 row ending where v1 begins
    val closed = h.filter(!$"is_current")
    assert(closed.filter($"valid_from" === 0 && $"valid_to" === 1).count()
      == closed.count())
    assert(closed.count() > 0)
  }

  test("csv and json round-trips preserve schema exactly") {
    val csv = StorageQueries.qCsvRoundtrip(spark, sf)
    assert(csv.schema == Tables.nation(spark, sf).schema)
    val json = StorageQueries.qJsonRoundtrip(spark, sf)
    // projection renames acctbal; spot-check the enforced input side
    assert(json.schema.fieldNames.toSeq ==
      Seq("c_custkey", "c_name", "c_nationkey", "acctbal", "c_mktsegment"))
    assert(csv.count() == Tables.nation(spark, sf).count())
    assert(json.count() == Tables.customer(spark, sf).count())
  }

  test("table checksum: partitioning-invariant, row-sensitive") {
    import spark.implicits._
    val base = StorageQueries.qTableChecksum(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    // same rows through a different physical layout → same checksums
    val reshuffled = graft.sources.Tables.documents(spark, sf)
      .repartition(13)
    reshuffled.createOrReplaceTempView("docs_reshuffled")
    val fp = org.apache.spark.sql.functions.conv(
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat_ws("|",
            $"doc_id", $"lang", $"source", $"n_chars",
            org.apache.spark.sql.functions.md5($"text"))), 1, 15),
      16, 10).cast("long")
    val again = reshuffled.select($"lang", fp.as("fp"))
      .groupBy($"lang")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.expr("bit_xor(fp)").as("checksum"))
      .orderBy($"lang").as[(String, Long, Long)].collect().toSeq
    assert(base == again, "checksum must not depend on partitioning")
    // flipping a single row's content must change that group's checksum
    val mutated = graft.sources.Tables.documents(spark, sf)
      .withColumn("text", org.apache.spark.sql.functions.when(
        $"doc_id" === 0L, org.apache.spark.sql.functions.concat($"text",
          org.apache.spark.sql.functions.lit("X"))).otherwise($"text"))
    val lang0 = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" === 0L).select($"lang").as[String].head()
    val mutatedSum = mutated.select($"lang", fp.as("fp"))
      .groupBy($"lang").agg(
        org.apache.spark.sql.functions.expr("bit_xor(fp)").as("checksum"))
      .filter($"lang" === lang0).select($"checksum").as[Long].head()
    val baseSum = base.find(_._1 == lang0).get._3
    assert(mutatedSum != baseSum, "a changed row must change the checksum")
  }

  test("mergeSchema surfaces the evolved column with nulls for old batches") {
    import spark.implicits._
    val merged = StorageQueries.qMergeSchema(spark, sf)
    val rows = merged.as[(Long, String, Option[Long])].collect()
    assert(rows.length == Tables.nation(spark, sf).count())
    rows.foreach { case (k, _, region) =>
      if (k % 2 == 0) assert(region.isEmpty,
        s"v1 row $k must read NULL for the column it never wrote")
      else assert(region.nonEmpty, s"v2 row $k lost its n_regionkey")
    }
    // evolved values match the source table exactly
    val expected = Tables.nation(spark, sf)
      .filter($"n_nationkey" % 2 === 1)
      .select($"n_nationkey", $"n_regionkey")
      .as[(Long, Long)].collect().toMap
    rows.filter(_._1 % 2 == 1).foreach { case (k, _, region) =>
      assert(region.contains(expected(k)))
    }
  }
}
