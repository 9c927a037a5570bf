package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Theorem gates for the MinHash band-configuration frontier; value
  * correctness is oracle-gated (q_band_tune hash-matches DuckDB).
  *
  * The nesting theorem behind the monotonicity gates: an r-row band hash
  * collision is string equality of the concatenated slots, which implies
  * every sub-band of those slots collides too — so each stricter config's
  * candidate set is a subset of the looser one's, and candidate count,
  * hit count, and recall are all non-increasing in rows-per-band. */
class BandTuneSpec extends SparkSpecBase with Matchers {

  private lazy val rows = DedupOps.bandTune(spark, sfDir).collect()

  test("one row per config in strictness order, counts consistent") {
    rows.map(r => (r.getAs[Int]("n_bands"), r.getAs[Int]("n_rows"))).toSeq shouldBe
      DedupOps.BandConfigs
    rows.foreach { r =>
      r.getAs[Long]("n_hit") should be <= r.getAs[Long]("n_cand")
      r.getAs[Long]("n_hit") should be <= r.getAs[Long]("n_truth")
    }
    all(rows.map(_.getAs[Long]("n_truth"))) shouldBe rows.head.getAs[Long]("n_truth")
    rows.head.getAs[Long]("n_truth") should be > 0L // planted near-dups
  }

  test("candidate sets nest: n_cand, n_hit, recall non-increasing in rows-per-band") {
    def nonIncreasing(xs: Seq[Double]): Unit =
      xs.zip(xs.tail).foreach { case (a, b) => b should be <= a }
    nonIncreasing(rows.map(_.getAs[Long]("n_cand").toDouble).toSeq)
    nonIncreasing(rows.map(_.getAs[Long]("n_hit").toDouble).toSeq)
    nonIncreasing(rows.map(_.getAs[Double]("recall")).toSeq)
  }

  test("chosen is the strictest config clearing the recall target") {
    val meeting = rows.filter(_.getAs[Double]("recall") >= DedupOps.BandTuneTarget)
    val chosen = rows.filter(_.getAs[Boolean]("chosen"))
    if (meeting.isEmpty) chosen shouldBe empty
    else chosen.map(_.getAs[Int]("n_rows")).toSeq shouldBe
      Seq(meeting.map(_.getAs[Int]("n_rows")).max)
  }
}
