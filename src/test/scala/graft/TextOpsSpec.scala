package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextOps

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-test")
    .getOrCreate()
}

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextOps.cleanText($"t")).as[String].head()

  test("cleanText: lowercase, bracket spans, punctuation, digit-words — reference order") {
    // reference: reddit_consumer.py:58-64
    assert(clean("Hello World") == "hello world")
    assert(clean("keep [drop me] keep") == "keep  keep")
    assert(clean("it's a test!") == "its a test")
    assert(clean("abc123def xyz 42") == " xyz ")
    // bracket strip happens before punctuation strip: '[' left by a
    // malformed span is then removed as punctuation
    assert(clean("a [unclosed") == "a unclosed")
  }

  test("cleanText is idempotent") {
    val fixtures = Seq("Hello, World! [x] a1b", "", "plain text", "[][]()")
    fixtures.foreach { f => assert(clean(clean(f)) == clean(f)) }
  }

  test("dropStopwords keeps order, duplicates, and empty tokens") {
    val got = Seq("the spark a spark  engine").toDF("t")
      .select(TextOps.dropStopwords(TextOps.tokenize($"t")))
      .as[Seq[String]].head()
    // "the"/"a" dropped; double space yields an empty token that survives
    // (Python `split(" ")` semantics, reddit_consumer.py:146)
    assert(got == Seq("spark", "spark", "", "engine"))
  }

  test("adjacentBigrams canonicalizes pairs like Python tuple compare") {
    // reference pairwise (reddit_consumer.py:67-71): (a,b) if a<b else (b,a)
    val got = Seq(Seq("b", "a", "b", "a")).toDF("toks")
      .select(TextOps.adjacentBigrams($"toks").as("p"))
      .selectExpr("transform(p, x -> concat(x.a, '|', x.b))")
      .as[Seq[String]].head()
    assert(got == Seq("a|b", "a|b", "a|b"))
  }

  test("adjacentBigrams: self-pairs and short inputs") {
    def pairs(ts: Seq[String]) =
      Seq(ts).toDF("toks").select(TextOps.adjacentBigrams($"toks").as("p"))
        .selectExpr("transform(p, x -> concat(x.a, '|', x.b))")
        .as[Seq[String]].head()
    assert(pairs(Seq("x", "x")) == Seq("x|x"))   // a==b kept, both sides equal
    assert(pairs(Seq("only")) == Seq())
    assert(pairs(Seq()) == Seq())
  }

  test("hashtags: findall #(\\w+)") {
    val got = Seq("a #tag1 mid #tag_2! #末 none# #").toDF("t")
      .select(TextOps.hashtags($"t")).as[Seq[String]].head()
    assert(got == Seq("tag1", "tag_2"))
  }
}
