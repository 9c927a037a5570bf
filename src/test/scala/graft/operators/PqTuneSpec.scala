package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Gates for the PQ compression frontier (q_pq_tune is rows-only by
  * design — k-means training has no SQL twin, the PqIndex precedent).
  *
  * The round-11 discipline: assert what holds by THEOREM (exact rerank
  * over a shortlist recovers exactly the shortlist's true-top-10
  * members; the cost columns are arithmetic), and gate the measured
  * byte/recall dominance only where measured. */
class PqTuneSpec extends SparkSpecBase with Matchers {

  private lazy val rows = PqTune.pqTune(spark, sfDir).collect()

  test("one row per candidate m, in ladder order, with arithmetic cost columns") {
    rows.map(_.getAs[Int]("m")).toSeq shouldBe PqTune.Ms
    rows.foreach { r =>
      r.getAs[Int]("code_bytes") shouldBe r.getAs[Int]("m")
      r.getAs[Double]("compression") shouldBe 256.0 / r.getAs[Int]("m")
    }
  }

  test("two-stage recall equals shortlist containment (exact-rerank theorem)") {
    // exact rerank scores a true-top-10 member above every non-member it
    // shares the shortlist with (same scores, same vec_id tie-break as
    // the truth ranking), so |top10(rerank) ∩ brute| == |shortlist ∩
    // brute| — the measured recall IS the shortlist's containment, and
    // the rerank stage can neither create nor lose a hit
    val (qs, pairs, brute) = PqTune.sampleAndTruth(spark, sfDir)
    val sl = PqTune.shortlistFor(spark, sfDir, qs, m = 8)
      .localCheckpoint(true)
    val containment = sl.join(brute, Seq("q_id", "vec_id"), "left_semi").count()
    val hits = PqTune.rerankHits(sl, pairs, brute).head().getLong(0)
    hits shouldBe containment
  }

  test("chosen is the unique cheapest candidate clearing the target, when one clears") {
    val meeting = rows.filter(_.getAs[Double]("recall_10") >= IvfTune.TuneTarget)
    val chosen = rows.filter(r => !r.isNullAt(r.fieldIndex("chosen")) &&
      r.getAs[Boolean]("chosen"))
    if (meeting.nonEmpty)
      chosen.map(_.getAs[Int]("m")).toSeq shouldBe
        Seq(meeting.map(_.getAs[Int]("m")).min)
    else chosen shouldBe empty
  }

  test("measured byte/recall dominance: 16-byte codes beat 2-byte codes on this corpus") {
    // data-dependent but measured (the IvfTuneSpec discipline): finer
    // subspace cuts at the same per-subspace codebook size quantize less
    // — the frontier's reason to exist
    val byM = rows.map(r => r.getAs[Int]("m") -> r.getAs[Double]("recall_10")).toMap
    byM(16) should be > byM(2)
  }

  test("the block's sample matches the family's (comparable frontiers by construction)") {
    val (qs, _, _) = PqTune.sampleAndTruth(spark, sfDir)
    val expected = graft.Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("vec_id") >= 16)
      .filter(org.apache.spark.sql.functions.col("vec_id")
        % IvfTune.TuneSampleMod === IvfTune.TuneSampleRes)
      .count()
    rows.head.getAs[Long]("n_q") shouldBe expected
    qs.count() shouldBe expected
  }
}
