package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.GraftBridge
import graft.plans.GraftExtensions

/** The full SQL-callable function surface installed by GraftExtensions:
  * same expression trees as the DataFrame API, reachable from pure SQL. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftBridge.applyExtensions(s, new GraftExtensions()(_))
    s
  }

  test("text surface callable from spark.sql") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val raw = "Hello   WORLD [ref] 42x !!"
    val r = spark.sql(
      s"SELECT clean_text('$raw') AS c, " +
      "drop_stopwords(gr_tokenize('the cat and dog')) AS t, " +
      "hashtags('go #spark and #Scala3 now') AS h, " +
      "adjacent_bigrams(array('a', 'b', 'c')) AS b").head()
    // the SQL function must equal the DataFrame-API function exactly
    val viaDf = spark.range(1)
      .select(graft.functions.TextOps.cleanText(lit(raw)).as("c"))
      .head().getString(0)
    assert(r.getString(0) == viaDf)
    assert(r.getSeq[String](1) == Seq("cat", "dog"))
    assert(r.getSeq[String](2) == Seq("spark", "Scala3"))
    assert(r.getSeq[Any](3).length == 2)
  }

  test("enrichment surface callable from spark.sql") {
    val r = spark.sql(
      "SELECT demojize('nice 😀') AS d, " +
      "vader('I love this great thing').compound AS v, " +
      "tf_keywords('alpha beta alpha gamma alpha beta') AS k").head()
    assert(r.getString(0).contains(":"), s"demojize produced ${r.getString(0)}")
    assert(r.getDouble(1) > 0.5, "clearly positive text must score positive")
    assert(r.getSeq[String](2).head == "alpha")
  }

  test("media surface callable from spark.sql") {
    val r = spark.sql(
      "SELECT media_kind(unhex('89504E470D0A1A0A')) AS k").head()
    assert(r.getString(0) == "png")
  }

  test("normalization surface callable from spark.sql") {
    val r = spark.sql(
      "SELECT nfc_normalize('Cafe\u0301') AS n, " +
      "canonical_url('HTTP://X.COM:80/a/?utm_s=1#f') AS u").head()
    assert(r.getString(0) == "Caf\u00e9") // precomposed output
    assert(r.getString(1) == "http://x.com/a")
  }
}
