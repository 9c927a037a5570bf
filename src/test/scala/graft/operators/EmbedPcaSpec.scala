package graft.operators

import graft.{SparkSpecBase, Tables}
import org.scalatest.matchers.should.Matchers

/** Algebraic gates for the PCA suite. q_embed_covariance is value-checked
  * by the DuckDB oracle; the eigensolve has no SQL twin, so q_embed_pca
  * is gated here by the invariants that uniquely characterize a correct
  * decomposition: orthonormality, trace preservation, eigenvalue
  * ordering, and per-component projection variance = eigenvalue. */
class EmbedPcaSpec extends SparkSpecBase with Matchers {

  test("jacobi eigensolver solves a hand-checkable symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)/√2) and 1
    val (values, v) = EmbedPca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    values.sorted.toSeq.map(x => math.rint(x * 1e9) / 1e9) shouldBe Seq(1.0, 3.0)
    // columns orthonormal
    val dots = for (a <- 0 to 1; b <- 0 to 1)
      yield (a, b, v(0)(a) * v(0)(b) + v(1)(a) * v(1)(b))
    dots.foreach { case (a, b, d) =>
      d shouldBe (if (a == b) 1.0 else 0.0) +- 1e-12
    }
  }

  test("components are orthonormal, descending, and trace-preserving") {
    val comps = EmbedPca.components(spark, sfDir)
    val dim = comps.head._2.length
    comps.length shouldBe dim
    // descending eigenvalues, all >= 0 up to numerical noise (covariance
    // matrices are PSD; the round-6 inputs give strictly positive spectra)
    comps.map(_._1).zip(comps.tail.map(_._1)).foreach { case (a, b) =>
      a should be >= b - 1e-12
    }
    comps.last._1 should be > -1e-9
    // orthonormal within solver tolerance
    for (a <- 0 until dim; b <- a until dim) {
      val d = (0 until dim).map(i => comps(a)._2(i) * comps(b)._2(i)).sum
      d shouldBe (if (a == b) 1.0 else 0.0) +- 1e-9
    }
    // Σλ = tr(Σ) — the decomposition conserves total variance (computed
    // from the SAME rounded covariance frame the solver consumed)
    val trace = EmbedPca.covariance(spark, sfDir).collect()
      .filter(r => r.getLong(0) == r.getLong(1)).map(_.getDouble(2)).sum
    comps.map(_._1).sum shouldBe trace +- 1e-9
    // deterministic across invocations (sign normalization included)
    val again = EmbedPca.components(spark, sfDir)
    comps.map(_._1).toSeq shouldBe again.map(_._1).toSeq
    comps.map(_._2.toSeq).toSeq shouldBe again.map(_._2.toSeq).toSeq
  }

  test("PCA-shortlist search recovers the exact top-5 on this corpus") {
    // isotropic worst-case data (flat spectrum): half the dims + a
    // 10%-of-corpus shortlist still achieve full recall here, and any
    // projection-math regression (wrong component, unsorted eigenvalues,
    // sign chaos) collapses this immediately
    val r = EmbedPca.pcaRecall(spark, sfDir).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n_hits") shouldBe 5L
    r.head.getAs[Double]("recall") shouldBe 1.0
  }

  test("projection variance per component equals its eigenvalue") {
    val comps = EmbedPca.components(spark, sfDir).take(EmbedPca.PcaComponents)
    val rows = EmbedPca.pcaProject(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count().toDouble
    rows.length shouldBe n.toLong * EmbedPca.PcaComponents
    rows.groupBy(_.getAs[Long]("pc")).foreach { case (pc, group) =>
      val xs = group.map(_.getAs[Double]("proj"))
      val mean = xs.sum / n
      val popVar = xs.map(x => (x - mean) * (x - mean)).sum / n
      // rounding the covariance frame and the projections to 6 decimals
      // bounds the drift; 1e-3 is far above that noise floor and far
      // below the eigenvalue spacing
      popVar shouldBe comps(pc.toInt - 1)._1 +- 1e-3
    }
  }

  test("persisted PCA model round-trips bit-identically to a fresh train") {
    val fresh = EmbedPca.trainComponents(spark, sfDir)
    val cached = EmbedPca.components(spark, sfDir) // trains+writes or reads
    val reread = EmbedPca.components(spark, sfDir) // definitely reads
    val f = java.nio.file.Paths.get(
      graft.sources.IndexCatalog.cacheBase(sfDir), "pca-model-v1.txt")
    assert(java.nio.file.Files.exists(f), "model file must persist")
    Seq(cached, reread).foreach { model =>
      model.length shouldBe fresh.length
      model.zip(fresh).foreach { case ((ev1, v1), (ev2, v2)) =>
        ev1 shouldBe ev2 // exact: Double.toString round-trips
        v1.toSeq shouldBe v2.toSeq
      }
    }
  }
}
