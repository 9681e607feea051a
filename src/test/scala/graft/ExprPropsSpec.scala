package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Seeded-random property checks for column expressions (batch-evaluated
  * once per suite — per-case Spark jobs would be too slow). */
class ExprPropsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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
