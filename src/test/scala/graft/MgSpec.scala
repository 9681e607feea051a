package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{MgBuffer, MisraGries}

/** Misra–Gries heavy hitters: the two theorems q195 publishes —
  * guaranteed membership above n/(k+1) and the bounded under-estimate —
  * must hold under ANY partitioning (merge is the PODS'12 union-sum +
  * (k+1)-largest subtraction), plus a skew fixture where the sketch
  * provably separates hitters from tail. */
class MgSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  val K = 32

  private def toks = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split($"text", " ")).as("term"))
  }

  private def sketchOf(df: org.apache.spark.sql.DataFrame)
      : Map[String, Long] = {
    import spark.implicits._
    df.select(MisraGries.mgSketch(col("term"), K).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.cnt")).as[(String, Long)]
      .collect().toMap
  }

  test("mg: membership + under-estimate bound hold for every partitioning") {
    import spark.implicits._
    val exact = toks.groupBy($"term").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    for (parts <- Seq(1, 7, 32)) {
      val sk = sketchOf(toks.repartition(parts))
      assert(sk.size <= K)
      exact.foreach { case (t, c) =>
        val est = sk.getOrElse(t, 0L)
        assert(est <= c, s"mg overcounted '$t': $est > $c (parts=$parts)")
        assert((c - est) * (K + 1) <= n,
          s"undercount of '$t' beyond n/(k+1): c=$c est=$est n=$n parts=$parts")
        if (c * (K + 1) > n)
          assert(sk.contains(t),
            s"guaranteed hitter '$t' (c=$c > n/${K + 1}) missing at parts=$parts")
      }
    }
  }

  test("mg: adversarial skew — hitters survive a flood of distinct tail terms") {
    import spark.implicits._
    // 3 hot terms at 2000 each + 6000 singleton terms: n = 12000,
    // n/(k+1) ≈ 363 — the hot terms are far above, the tail far below.
    val hot = (1 to 3).flatMap(h => Seq.fill(2000)(s"hot$h"))
    val tail = (1 to 6000).map(i => s"tail$i")
    val df = spark.createDataset(util.Random.shuffle(hot ++ tail).toSeq)
      .toDF("term").repartition(16)
    val sk = sketchOf(df)
    (1 to 3).foreach { h =>
      assert(sk.contains(s"hot$h"), s"hot$h missing from sketch")
      assert(sk(s"hot$h") >= 2000L - 12000L / (K + 1))
    }
  }

  test("mg: buffer-level weighted decrement math stays non-negative and bounded") {
    val b = new MgBuffer(2)
    b.add("a", 5); b.add("b", 3); b.add("c", 4)
    // c arrives with the buffer full: decrements drain min counters
    assert(b.counts.values.forall(_ > 0))
    assert(b.counts.size <= 2)
    val b2 = new MgBuffer(2)
    b2.add("a", 10)
    b.mergeFrom(b2)
    assert(b.counts.size <= 2)
    assert(b.counts("a") >= 10L, "merge must keep the dominant counter")
  }
}
