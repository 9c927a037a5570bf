package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Theorem gates for the LSH hamming-radius frontier; value correctness
  * is oracle-gated (q_lsh_tune hash-matches DuckDB). */
class LshTuneSpec extends SparkSpecBase with Matchers {

  private lazy val rows = LshTune.lshTune(spark, sfDir).collect()

  test("one row per candidate radius, recall monotone, full-ring anchors at 1.0/1.0") {
    rows.map(_.getAs[Int]("radius")).toSeq shouldBe LshTune.TuneRadii
    val recalls = rows.map(_.getAs[Double]("recall_10")).toSeq
    recalls.zip(recalls.tail).foreach { case (a, b) => b should be >= a }
    // radius 8 flips every plane: all 256 buckets = the whole pair frame
    rows.last.getAs[Double]("recall_10") shouldBe 1.0
    rows.last.getAs[Double]("scan_frac") shouldBe 1.0
  }

  test("scan_frac is monotone non-decreasing (wider rings admit supersets)") {
    val fracs = rows.map(_.getAs[Double]("scan_frac")).toSeq
    fracs.zip(fracs.tail).foreach { case (a, b) => b should be >= a }
  }

  test("the frontier shares q_nprobe_tune's query sample — the families are comparable") {
    val ivf = IvfTune.nprobeTune(spark, sfDir).collect()
    rows.head.getAs[Long]("n_q") shouldBe ivf.head.getAs[Long]("n_q")
  }
}
