package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vader

class VaderSpec extends AnyFunSuite {

  test("pinned scores: single lexicon word") {
    val s = Vader.polarityScores("good")
    // sum=1.9 → compound = 1.9/sqrt(1.9²+15) = 0.4404
    assert(s.compound == 0.4404)
    assert(s.positive == 1.0 && s.negative == 0.0 && s.neutral == 0.0)
  }

  test("pinned scores: negation flips and damps (N_SCALAR -0.74)") {
    val s = Vader.polarityScores("not good")
    // 1.9 * -0.74 = -1.406 → compound = -1.406/sqrt(1.406²+15) = -0.3412
    assert(s.compound == -0.3412)
    assert(s.negative > 0 && s.positive == 0.0)
  }

  test("booster increases intensity with distance decay") {
    val base = Vader.polarityScores("good").compound
    val very = Vader.polarityScores("very good").compound
    val farBooster = Vader.polarityScores("very truly indeed good").compound
    assert(very > base)
    assert(farBooster > base && farBooster < very)
  }

  test("ALL-CAPS emphasis applies only on cap-diff text") {
    val plain = Vader.polarityScores("this movie is good").compound
    val caps = Vader.polarityScores("this movie is GOOD").compound
    val allCaps = Vader.polarityScores("THIS MOVIE IS GOOD").compound
    assert(caps > plain)
    assert(allCaps == plain) // no cap difference → no emphasis
  }

  test("'but' re-weights the clause after it") {
    assert(Vader.polarityScores("good but bad").compound < 0)
    assert(Vader.polarityScores("bad but good").compound > 0)
  }

  test("exclamation emphasis, capped at 4") {
    val c0 = Vader.polarityScores("good").compound
    val c1 = Vader.polarityScores("good!").compound
    val c4 = Vader.polarityScores("good!!!!").compound
    val c9 = Vader.polarityScores("good!!!!!!!!!").compound
    assert(c1 > c0 && c4 > c1 && c9 == c4)
  }

  test("neutral/empty text scores zero") {
    assert(Vader.polarityScores("") == Vader.Scores(0, 0, 0, 0))
    assert(Vader.polarityScores("table chair window").compound == 0.0)
  }

  test("emoticons score") {
    assert(Vader.polarityScores("nice :)").compound >
      Vader.polarityScores("nice").compound)
  }

  test("double negation flips back positive (N_SCALAR once per negator)") {
    // 1.9 * -0.74 * -0.74 = 1.0404 → positive again, weaker than bare
    val s = Vader.polarityScores("not not good")
    assert(s.compound > 0)
    assert(s.compound < Vader.polarityScores("good").compound)
  }

  test("idiom table replaces the lexicon valence (SPECIAL_CASES)") {
    // "kiss of death": the twoonezero window at the lexicon hit "death"
    // replaces -2.9 with the published idiom value -1.5
    //   → compound = -1.5/sqrt(1.5²+15) = -0.3612
    val s = Vader.polarityScores("it was the kiss of death")
    assert(s.compound == -0.3612)
    // forward window: "broken heart" overrides broken's -1.8 with -2.9
    val b = Vader.polarityScores("this movie left me with broken heart")
    val plain = Vader.polarityScores("this movie left me with broken glass")
    assert(b.compound < plain.compound)
  }

  test("'never so/this' boosts x1.25 instead of flipping") {
    val good = Vader.polarityScores("good").compound
    val soGood = Vader.polarityScores("so good").compound
    val neverSoGood = Vader.polarityScores("never so good").compound
    assert(soGood > good)           // booster path
    assert(neverSoGood > soGood)    // 1.25 boost, NOT the -0.74 flip
    assert(Vader.polarityScores("never good").compound < 0) // plain negation
  }

  test("'without doubt' leaves valence unchanged (no negation)") {
    // "doubt" is itself negated by "without" (-1.5 × -0.74 = +1.11) and
    // "great" keeps its full 3.1 via the without-doubt special case, so
    // the sum EXCEEDS bare "great"; a non-doubt filler flips instead.
    assert(Vader.polarityScores("without doubt great").compound >
      Vader.polarityScores("great").compound)
    assert(Vader.polarityScores("without regard great").compound < 0)
  }

  test("multiword booster bigrams damp via the idiom pass") {
    // "sort" (unlike "kind") carries no lexicon valence of its own, so
    // the only delta vs the filler sentence is the "sort of" B_DECR
    val sortOf = Vader.polarityScores("it was sort of good").compound
    val bare = Vader.polarityScores("it was truly just good").compound
    assert(sortOf > 0 && sortOf < bare)
  }

  test("lexicon words in the look-back window do not negate ('no good')") {
    // published guard: "no" is itself a lexicon entry, so the distance-1
    // pass is skipped whole — both words score, no N_SCALAR flip
    val s = Vader.polarityScores("no good")
    // sum = -1.2 + 1.9 = 0.7 → compound = 0.7/sqrt(0.49+15) = 0.1779
    assert(s.compound == 0.1779)
  }

  test("third-tranche lexicon words score (previously out-of-subset)") {
    assert(Vader.polarityScores("gorgeous").compound > 0)
    assert(Vader.polarityScores("devastated").compound < 0)
    assert(Vader.polarityScores("thrilled").compound >
      Vader.polarityScores("decent").compound)
    assert(Vader.polarityScores("catastrophe").compound <
      Vader.polarityScores("awkward").compound)
    // negation rules compose with the new entries
    assert(Vader.polarityScores("not thrilled").compound < 0)
  }
}
