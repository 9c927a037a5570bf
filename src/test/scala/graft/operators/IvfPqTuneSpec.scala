package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Gates for the joint IVF-PQ frontier (rows-only by design — k-means
  * training, the PqIndex precedent).
  *
  * The strongest gate is a cross-query consistency THEOREM: the
  * full-depth column (nprobe=16 scans every bucket) is definitionally
  * the same computation as q_pq_tune — same query block, same
  * deterministic training, same shortlist and rerank — so the numbers
  * must agree exactly. Everything else is contract shape: scan_frac is
  * a pure function of probe depth (m cannot change what the partition
  * filters admit), and chosen follows the (scan, bytes) lexicographic
  * deployment preference. */
class IvfPqTuneSpec extends SparkSpecBase with Matchers {

  private lazy val rows = IvfPqTune.ivfPqTune(spark, sfDir).collect()

  test("one row per (nprobe, m) cell, in ladder order") {
    val cells = rows.map(r => (r.getAs[Int]("nprobe"), r.getAs[Int]("m"))).toSeq
    cells shouldBe (for (n <- IvfPqTune.Nprobes; m <- PqTune.Ms) yield (n, m))
  }

  test("the full-depth column equals q_pq_tune cell-for-cell (identical definitions)") {
    val joint = rows.filter(_.getAs[Int]("nprobe") == 16)
      .map(r => r.getAs[Int]("m") -> r.getAs[Double]("recall_10")).toMap
    val flat = PqTune.pqTune(spark, sfDir).collect()
      .map(r => r.getAs[Int]("m") -> r.getAs[Double]("recall_10")).toMap
    joint shouldBe flat
  }

  test("scan_frac depends only on probe depth; full depth scans everything") {
    rows.groupBy(_.getAs[Int]("nprobe")).foreach { case (_, group) =>
      group.map(_.getAs[Double]("scan_frac")).distinct should have length 1
    }
    val byProbe = rows.groupBy(_.getAs[Int]("nprobe"))
      .map { case (n, g) => n -> g.head.getAs[Double]("scan_frac") }
    IvfPqTune.Nprobes.map(byProbe).sliding(2).foreach {
      case Seq(a, b) => b should be > a
      case _ => ()
    }
    byProbe(16) shouldBe 1.0
  }

  test("chosen is the (smallest clearing nprobe, fewest bytes there) cell, when one clears") {
    val clearing = rows.filter(_.getAs[Double]("recall_10") >= IvfTune.TuneTarget)
    val chosen = rows.filter(r => !r.isNullAt(r.fieldIndex("chosen")) &&
      r.getAs[Boolean]("chosen"))
    if (clearing.nonEmpty) {
      val minProbe = clearing.map(_.getAs[Int]("nprobe")).min
      val minM = clearing.filter(_.getAs[Int]("nprobe") == minProbe)
        .map(_.getAs[Int]("m")).min
      chosen.map(r => (r.getAs[Int]("nprobe"), r.getAs[Int]("m"))).toSeq shouldBe
        Seq((minProbe, minM))
    } else chosen shouldBe empty
  }

  test("serving pin: PqIndex's tuned dials equal the live sweep's chosen cell (measurement→deployment wiring)") {
    // q_ivfpq_tuned serves exactly what q_ivfpq_tune chose — a corpus or
    // ladder change that moves the choice fails this pin instead of
    // silently serving stale dials (the q_fusion_serve pin discipline)
    IvfPqTune.chosenCell(spark, sfDir) shouldBe
      (PqIndex.TunedNprobe, PqIndex.TunedM)
  }

  test("q_ivfpq_tuned clears the tune's recall target against exact brute force") {
    val got = PqIndex.ivfPqTuned(spark, sfDir).collect().map(_.getLong(0))
    got should have length 10
    val exact = VectorOps.knn(spark, sfDir).collect().map(_.getLong(0)).toSet
    // ADC shortlist (Shortlist=100, full fanout at the chosen cell) +
    // exact rerank: recall@10 must clear the target the cell was chosen
    // for (the cell's sweep recall was 0.96 before reranking)
    got.count(exact) / 10.0 should be >= IvfTune.TuneTarget
    // determinism: the served ranking is stable across runs
    PqIndex.ivfPqTuned(spark, sfDir).collect().map(_.getLong(0)).toSeq shouldBe got.toSeq
  }
}
