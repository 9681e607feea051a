package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Demojize (P3, reference: twitter_consumer.py:89, reddit_consumer.py:130
  * — `emoji.demojize(text, language="en")`): replace each emoji with its
  * `:underscored_name:` form.
  *
  * The name table is a built-in subset of the public Unicode CLDR short
  * names (the full table isn't available offline). Unknown emoji pass
  * through unchanged — same behavior as the reference for non-emoji text:
  * emoji-free strings are returned untouched (property-tested).
  */
object Emoji {

  /** Codepoint → CLDR-style short name (subset). */
  private[functions] val Names: Map[Int, String] = Map(
    0x1F600 -> "grinning_face",
    0x1F601 -> "beaming_face_with_smiling_eyes",
    0x1F602 -> "face_with_tears_of_joy",
    0x1F603 -> "grinning_face_with_big_eyes",
    0x1F604 -> "grinning_face_with_smiling_eyes",
    0x1F605 -> "grinning_face_with_sweat",
    0x1F606 -> "grinning_squinting_face",
    0x1F609 -> "winking_face",
    0x1F60A -> "smiling_face_with_smiling_eyes",
    0x1F60D -> "smiling_face_with_heart-eyes",
    0x1F60E -> "smiling_face_with_sunglasses",
    0x1F610 -> "neutral_face",
    0x1F614 -> "pensive_face",
    0x1F615 -> "confused_face",
    0x1F618 -> "face_blowing_a_kiss",
    0x1F61C -> "winking_face_with_tongue",
    0x1F620 -> "angry_face",
    0x1F621 -> "enraged_face",
    0x1F622 -> "crying_face",
    0x1F625 -> "sad_but_relieved_face",
    0x1F629 -> "weary_face",
    0x1F62D -> "loudly_crying_face",
    0x1F631 -> "face_screaming_in_fear",
    0x1F633 -> "flushed_face",
    0x1F634 -> "sleeping_face",
    0x1F637 -> "face_with_medical_mask",
    0x1F642 -> "slightly_smiling_face",
    0x1F643 -> "upside-down_face",
    0x1F644 -> "face_with_rolling_eyes",
    0x1F44D -> "thumbs_up",
    0x1F44E -> "thumbs_down",
    0x1F44F -> "clapping_hands",
    0x1F4AA -> "flexed_biceps",
    0x1F525 -> "fire",
    0x1F389 -> "party_popper",
    0x1F38A -> "confetti_ball",
    0x1F494 -> "broken_heart",
    0x2764  -> "red_heart",
    0x1F499 -> "blue_heart",
    0x1F49A -> "green_heart",
    0x1F4AF -> "hundred_points",
    0x1F680 -> "rocket",
    0x1F386 -> "fireworks",
    0x1F37A -> "beer_mug",
    0x1F355 -> "pizza",
    0x2B50  -> "star",
    0x1F31F -> "glowing_star",
    0x1F308 -> "rainbow",
    0x1F914 -> "thinking_face",
    0x1F923 -> "rolling_on_the_floor_laughing",
    0x1F970 -> "smiling_face_with_hearts",
    0x1F97A -> "pleading_face",
    0x1F926 -> "person_facepalming",
    0x1F937 -> "person_shrugging",
    0x1F64F -> "folded_hands",
    0x1F648 -> "see-no-evil_monkey",
    0x1F4A9 -> "pile_of_poo",
    0x1F47B -> "ghost",
    0x1F480 -> "skull",
  )

  /** Variation selectors & ZWJ dropped right after a named emoji. */
  private val Skip: Set[Int] = Set(0xFE0F, 0xFE0E)

  def demojize(text: String): String = {
    if (text == null) return null
    val sb = new java.lang.StringBuilder(text.length + 16)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      Names.get(cp) match {
        case Some(name) =>
          sb.append(':').append(name).append(':')
          // swallow a following variation selector
          if (i + w < text.length && Skip.contains(text.codePointAt(i + w))) i += 1
        case None =>
          // standalone variation selectors pass through — only a VS
          // directly after a *named* emoji is swallowed (identity on
          // unknown-emoji text must hold for the q51 oracle)
          sb.appendCodePoint(cp)
      }
      i += w
    }
    sb.toString
  }

  private val demojizeUdf = udf { (t: String) => demojize(t) }

  /** str → str with emoji replaced by :name:. */
  def demojizeCol(c: Column): Column = demojizeUdf(c)
}
