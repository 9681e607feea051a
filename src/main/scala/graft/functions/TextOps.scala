package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text operators re-expressing the reference's per-record enrichment
  * chain (reference: reddit_consumer.py:58-77, twitter_consumer.py:100-103)
  * as codegen'd Spark column expressions — no UDFs in this file, so the
  * whole chain stays inside WholeStageCodegen.
  */
object TextOps {

  /** Python's `string.punctuation`, as a Java/RE2 regex character class.
    * (reference: reddit_consumer.py:62 — `[%s]` % re.escape(punctuation)) */
  val PunctClass: String = """[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""

  /** clean_text (reference: reddit_consumer.py:58-64): lowercase, strip
    * `[...]` spans, strip punctuation, drop words containing digits.
    * Order matters and is preserved exactly. */
  def cleanText(c: Column): Column = {
    val lowered   = lower(c)
    val noBracket = regexp_replace(lowered, """\[.*?\]""", "")
    val noPunct   = regexp_replace(noBracket, PunctClass, "")
    regexp_replace(noPunct, """\w*\d\w*""", "")
  }

  /** NLTK English stopword list (public corpus, 179 entries) + the
    * reference's 10 custom additions (reddit_consumer.py:22-24). */
  val Stopwords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down",
    "in", "out", "on", "off", "over", "under", "again", "further",
    "then", "once", "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other",
    "some", "such", "no", "nor", "not", "only", "own", "same", "so",
    "than", "too", "very", "s", "t", "can", "will", "just", "don",
    "don't", "should", "should've", "now", "d", "ll", "m", "o", "re",
    "ve", "y", "ain", "aren", "aren't", "couldn", "couldn't", "didn",
    "didn't", "doesn", "doesn't", "hadn", "hadn't", "hasn", "hasn't",
    "haven", "haven't", "isn", "isn't", "ma", "mightn", "mightn't",
    "mustn", "mustn't", "needn", "needn't", "shan", "shan't",
    "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
    // reference custom additions (reddit_consumer.py:23)
    "im", "lol", "i'm", "got", "yeah", "it’s", "i’m",
  ).distinct

  /** Stopword set for SQL interpolation: ('a','the',...,'it''s'). */
  def stopwordsSqlList: String =
    Stopwords.map(w => "'" + w.replace("'", "''") + "'").mkString("(", ",", ")")

  /** Tokenize the way the reference does: split on a single space
    * (reddit_consumer.py:146 — `comment.split(" ")`). Empty tokens from
    * repeated spaces survive, as in Python. */
  def tokenize(c: Column): Column = split(c, " ")

  /** Stopword filter (F5, reddit_consumer.py:146) over a token array.
    * `filter` (higher-order fn) keeps order and duplicates — unlike
    * array_except, which dedups. Membership via isInCollection → InSet
    * (hash-set codegen), not a 179-element array scan. */
  def dropStopwords(tokens: Column): Column =
    filter(tokens, t => !t.isInCollection(Stopwords))

  /** Membership test against the stopword set (InSet codegen). */
  def isStopword(t: Column): Column = t.isInCollection(Stopwords)

  /** Adjacent unordered bigrams over a token array
    * (reference: pairwise, reddit_consumer.py:67-71): zip tokens with
    * their successors, canonicalize each pair with least/greatest
    * (Python's `(a,b) if a < b else (b,a)` string compare).
    * Returns array<struct<a,b>>; empty/1-token input → empty array. */
  def adjacentBigrams(tokens: Column): Column = {
    val n = size(tokens)
    zip_with(
      slice(tokens, lit(1), greatest(n - 1, lit(0))),
      slice(tokens, lit(2), greatest(n - 1, lit(0))),
      (x, y) => struct(least(x, y).as("a"), greatest(x, y).as("b")))
  }

  /** Hashtag extraction (P5, twitter_consumer.py:100-103):
    * `re.findall(r"#(\w+)", text)`. */
  def hashtags(c: Column): Column =
    regexp_extract_all(c, lit("""#(\w+)"""), lit(1))

  /** The DuckDB rendering of cleanText over an arbitrary SQL expression —
    * single source of truth: if cleanText changes, every oracle
    * referencing it follows. */
  def cleanTextSqlOn(expr: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(lower($expr),""" +
      """ '\[.*?\]', '', 'g'),""" +
      """ '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g'),""" +
      """ '\w*\d\w*', '', 'g')"""

  /** cleanText over the `text` column (the common case). */
  val cleanTextSql: String = cleanTextSqlOn("text")
}
