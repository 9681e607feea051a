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
