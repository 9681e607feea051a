package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Seeded-random property checks for column expressions (batch-evaluated
  * once per suite — per-case Spark jobs would be too slow). */
class ExprPropsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("throttle fold property: randomized event sets match the sequential reference") {
    import spark.implicits._
    // 40 keys × bursty random gaps, including exact-boundary gaps (the
    // 3600.0 tie must DROP: strict >) and duplicate timestamps
    val rnd = new scala.util.Random(7777)
    val rows = (1 to 40).flatMap { k =>
      var t = 1700000000.0 + rnd.nextInt(1000)
      (1 to rnd.nextInt(40) + 1).map { i =>
        t += (rnd.nextInt(5) match {
          case 0 => 0.0      // duplicate ts (event_id breaks the tie)
          case 1 => 3600.0   // exact boundary
          case _ => rnd.nextInt(7000).toDouble
        })
        // ts as INT64 nanos — the driver's events.parquet layout that
        // Tables.events expects (nanosAsLong + div-1000 truncation)
        (k.toLong * 1000 + i, k.toLong, "e", (t * 1e9).toLong)
      }
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "ts")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-throttle-prop").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // reference fold on the driver, at the same micros truncation
    val expected = rows.groupBy(_._2).values.flatMap { evs =>
      var last = Double.NegativeInfinity
      evs.sortBy(e => (e._4 / 1000, e._1)).flatMap { e =>
        val sec = (e._4 / 1000) / 1e6
        if (sec - last > 3600.0) { last = sec; Some(e._1) } else None
      }
    }.toSet
    val got = graft.operators.TimeQueries.qThrottleLastKept(spark, tmp)
      .select($"event_id").as[Long].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
  }

  private val corpus: Seq[String] = {
    val rnd = new scala.util.Random(123)
    val chars = "abcXYZ 0189[]().,!?#'-_ 末ß🎉 \t"
    Seq.fill(300)(Seq.fill(rnd.nextInt(60))(
      chars(rnd.nextInt(chars.length))).mkString)
  }

  private lazy val rows: Seq[(String, String, Seq[String], Seq[String], Seq[(String, String)], Seq[(String, String)])] = {
    import spark.implicits._
    corpus.toDF("t")
      .withColumn("p2", TextOps.adjacentBigrams(TextOps.tokenize($"t")))
      .select(
        $"t",
        TextOps.cleanText($"t").as("cleaned"),
        TextOps.tokenize($"t").as("toks"),
        TextOps.dropStopwords(TextOps.tokenize($"t")).as("kept"),
        // independent zip_with+null-pad reformulation of adjacentBigrams.
        // NB: the null filter must run BEFORE canonicalization —
        // least(x, null) returns x in Spark, which would fabricate a
        // self-pair from the padding row (caught by this very test).
        expr("transform(" +
          "filter(zip_with(split(t, ' '), slice(split(t, ' '), 2, 100000)," +
          " (x, y) -> struct(x AS x, y AS y)), p -> p.y is not null)," +
          " p -> struct(least(p.x, p.y) AS a, greatest(p.x, p.y) AS b))")
          .as("pairs_ref"),
        expr("transform(p2, x -> struct(x.a, x.b))").as("pairs_got"))
      .as[(String, String, Seq[String], Seq[String], Seq[(String, String)], Seq[(String, String)])]
      .collect().toSeq
  }

  test("adjacentBigrams agrees with an independent zip_with reformulation") {
    rows.foreach { case (t, _, _, _, ref, got) =>
      assert(got == ref, s"bigram mismatch on: '$t'")
    }
  }

  test("cleanText: lowercase, no punctuation class chars, no digit-words") {
    val punct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".toSet
    rows.foreach { case (_, cleaned, _, _, _, _) =>
      assert(cleaned == cleaned.toLowerCase, s"not lowercased: $cleaned")
      assert(!cleaned.exists(punct.contains), s"punct survived: $cleaned")
      cleaned.split(" ").foreach { w =>
        // a word containing an ascii digit must have been emptied
        assert(!w.exists(c => c.isDigit && c < 128.toChar), s"digit word: '$w'")
      }
    }
  }

  test("cleanText idempotence over random corpus") {
    import spark.implicits._
    val once = corpus.toDF("t").select(TextOps.cleanText($"t").as("c"))
    val twice = once.select(TextOps.cleanText($"c").as("c2")).as[String].collect()
    val onceV = once.as[String].collect()
    assert(onceV.toSeq == twice.toSeq)
  }

  test("dropStopwords: subsequence of input (order and duplicates kept)") {
    rows.foreach { case (_, _, toks, kept, _, _) =>
      // kept is a subsequence: every kept token appears in order in toks
      var i = 0
      kept.foreach { w =>
        val j = toks.indexOf(w, i)
        assert(j >= 0, s"$w not found in order")
        i = j + 1
      }
      assert(kept.forall(w => !TextOps.Stopwords.contains(w)))
    }
  }

  test("adjacentBigrams: size n-1, each pair canonicalized") {
    import spark.implicits._
    val got = corpus.toDF("t")
      .select(size(TextOps.tokenize($"t")).as("n"),
        TextOps.adjacentBigrams(TextOps.tokenize($"t")).as("p"))
      .selectExpr("n", "size(p) AS np",
        "forall(p, x -> x.a <= x.b) AS canon")
      .as[(Int, Int, Boolean)].collect()
    got.foreach { case (n, np, canon) =>
      assert(np == math.max(n - 1, 0))
      assert(canon)
    }
  }
}
