package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Demojize (P3, reference: twitter_consumer.py:89, reddit_consumer.py:130
  * — `emoji.demojize(text, language="en")`): replace each emoji with its
  * `:underscored_name:` form.
  *
  * The name table is the full public Unicode-CLDR-derived shortcode set
  * (2,810 emoji incl. ZWJ sequences, skin tones, flags), bundled as
  * `resources/graft/emoji_names.tsv` — regenerate with
  * `scripts/gen_emoji_table.py`. Matching is longest-first over UTF-16
  * sequences so multi-codepoint emoji (👍🏻, flags, families) resolve to
  * their own names before their prefixes. Unknown text passes through
  * unchanged — emoji-free strings are returned untouched
  * (property-tested, and the q51 oracle relies on it).
  */
object Emoji {

  /** Full emoji sequence (UTF-16 string) → CLDR-style short name. */
  private[functions] val Names: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/emoji_names.tsv")
    require(in != null, "missing resource graft/emoji_names.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val t = line.indexOf('\t')
      line.substring(0, t) -> line.substring(t + 1)
    }.toMap
    finally src.close()
  }

  /** Per leading UTF-16 char: candidate sequence lengths, longest first.
    * The leading-char check is the fast path — ordinary ASCII text other
    * than keycap bases ('#','*','0'-'9') never probes the map. */
  private val lengthsByHead: Map[Char, Array[Int]] =
    Names.keysIterator.toSeq.groupBy(_.charAt(0)).map { case (c, seqs) =>
      c -> seqs.map(_.length).distinct.sorted.reverse.toArray
    }

  /** Variation selectors dropped right after a named emoji (the table
    * keys mostly omit VS-16, e.g. "❤" is named but "❤️" is not). */
  private val Skip: Set[Int] = Set(0xFE0F, 0xFE0E)

  def demojize(text: String): String = {
    if (text == null) return null
    val sb = new java.lang.StringBuilder(text.length + 16)
    var i = 0
    while (i < text.length) {
      val head = text.charAt(i)
      var matched = false
      lengthsByHead.get(head) match {
        case Some(lens) =>
          var j = 0
          while (!matched && j < lens.length) {
            val l = lens(j)
            if (i + l <= text.length) {
              Names.get(text.substring(i, i + l)) match {
                case Some(name) =>
                  sb.append(':').append(name).append(':')
                  i += l
                  // swallow a following variation selector
                  if (i < text.length && Skip.contains(text.codePointAt(i)))
                    i += Character.charCount(text.codePointAt(i))
                  matched = true
                case None => ()
              }
            }
            j += 1
          }
        case None => ()
      }
      if (!matched) {
        // standalone variation selectors pass through — only a VS
        // directly after a *named* emoji is swallowed (identity on
        // unknown-emoji text must hold for the q51 oracle)
        val cp = text.codePointAt(i)
        sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
    }
    sb.toString
  }

  /** Public lookup — the table is useful on its own (tests, tooling). */
  def nameOf(sequence: String): Option[String] = Names.get(sequence)
  def allEmoji: Seq[String] = Names.keys.toSeq.sorted

  private val demojizeUdf = udf { (t: String) => demojize(t) }

  /** str → str with emoji replaced by :name:. */
  def demojizeCol(c: Column): Column = demojizeUdf(c)
}
