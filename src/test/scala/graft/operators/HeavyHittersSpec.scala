package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the 2-pass heavy-hitters operator on an ADVERSARIAL stream
  * the testdata cannot provide (its 31-word vocabulary fits the summary
  * whole): a 5000-term Zipf-ish stream forces real Misra–Gries eviction,
  * and the containment guarantee + exact-recount identity must survive
  * it.
  */
class HeavyHittersSpec extends SparkSpecBase with Matchers {

  test("MG summary under a 5000-term Zipf stream: eviction happens, heavies survive, 2-pass top-10 is exact") {
    import spark.implicits._
    // term i (i ≤ 10) appears 6000/i times — term_1 6000×, term_10 600× —
    // and the 4990-term tail once each; interleaved round-robin so each
    // partition sees heavy and rare terms mixed (the eviction-pressure
    // order, not a sorted best case). The head/tail split is deliberate:
    // with this shape N ≈ 22.5k, so the MG bound N/(k+1) ≈ 347 sits BELOW
    // rank 10's count (600) — the whole top-10 clears the containment
    // guarantee and the exactness assert below holds by THEOREM, not by
    // partitioning luck (the earlier 6000/i-everywhere shape left ranks
    // 8–10 under the bound, where exactness was only empirical).
    val vocab = 5000
    val freqs = (1 to vocab).map(i => s"term_$i" -> (if (i <= 10) 6000 / i else 1))
    val stream = scala.collection.mutable.ArrayBuffer.empty[String]
    var remaining = freqs.toArray.map(_._2)
    var left = remaining.sum
    var i = 0
    while (left > 0) {
      if (remaining(i) > 0) { stream += s"term_${i + 1}"; remaining(i) -= 1; left -= 1 }
      i = (i + 1) % vocab
    }
    val n = stream.size
    val terms = spark.createDataset(stream.toSeq).repartition(8)
    val k = TextOps.HeavyHittersK

    val cand = TextOps.misraGriesCandidates(terms, k)
    val candSet = cand.as[String].collect().toSet
    // the summary genuinely evicted: candidates are a small fraction of
    // the vocabulary, bounded by partitions × k
    candSet.size should be < vocab / 2
    candSet.size should be <= 8 * k
    // MG containment guarantee: every term with global count > N/(k+1)
    // is a candidate
    val threshold = n.toDouble / (k + 1)
    freqs.filter(_._2 > threshold).foreach { case (t, c) =>
      withClue(s"heavy term $t (count $c > $threshold):") {
        candSet should contain(t)
      }
    }
    // the precondition the exactness assert rests on: every top-10 count
    // clears the containment bound
    withClue(s"rank-10 count vs MG bound $threshold:") {
      freqs.map(_._2).sorted.reverse.take(10).min.toDouble should be > threshold
    }

    // 2-pass result == exact groupBy top-10 on the same stream
    val twoPass = terms.toDF("w").join(broadcast(cand), Seq("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = terms.toDF("w")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    twoPass shouldBe exact
  }

  test("q_heavy_hitters on the corpus: exact counts, deterministic order") {
    val rows = TextOps.heavyHitters(spark, sfDir).collect()
    rows.length shouldBe 10
    val counts = rows.map(_.getLong(1))
    counts.sorted.reverse shouldBe counts // descending
    counts.foreach(_ should be > 0L)
  }
}
