package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Algorithm-property gates for the nprobe recall sweep; value
  * correctness is oracle-gated (q_nprobe_tune hash-matches DuckDB).
  *
  * Asserts PROPERTIES that hold by theorem, not by data (the
  * round-11 discipline): recall is monotone in nprobe because the
  * candidate set at a deeper probe is a superset — any brute-top-10
  * member in the shallow probed top-10 is outranked by at most 9
  * corpus vectors, so it survives into every deeper probed top-10. */
class IvfTuneSpec extends SparkSpecBase with Matchers {

  private lazy val rows = IvfTune.nprobeTune(spark, sfDir).collect()

  test("one row per candidate nprobe, in ladder order") {
    rows.map(_.getAs[Int]("nprobe")).toSeq shouldBe IvfTune.TuneNprobes
  }

  test("recall@10 is monotone non-decreasing in nprobe (superset theorem)") {
    val recalls = rows.map(_.getAs[Double]("recall_10")).toSeq
    recalls.zip(recalls.tail).foreach { case (a, b) => b should be >= a }
  }

  test("probing every bucket is exact: the full-depth anchor reads 1.0") {
    rows.last.getAs[Double]("recall_10") shouldBe 1.0
    rows.last.getAs[Long]("n_hits") shouldBe rows.last.getAs[Long]("n_q") * 10
  }

  test("the cost side of the frontier: scan_frac strictly increasing, full depth scans everything") {
    // deeper probes admit strictly more pairs on any corpus where every
    // bucket is non-empty for some query (all 16 seed buckets hold their
    // own centroid vector, so each depth step adds at least those)
    val fracs = rows.map(_.getAs[Double]("scan_frac")).toSeq
    fracs.zip(fracs.tail).foreach { case (a, b) => b should be > a }
    fracs.last shouldBe 1.0
  }

  test("chosen is the unique smallest candidate clearing the target") {
    val meeting = rows.filter(_.getAs[Double]("recall_10") >= IvfTune.TuneTarget)
    meeting should not be empty // nprobe=16 is exact, so one always exists
    val chosen = rows.filter(_.getAs[Boolean]("chosen"))
    chosen.map(_.getAs[Int]("nprobe")).toSeq shouldBe
      Seq(meeting.map(_.getAs[Int]("nprobe")).min)
  }

  test("serving pin: TunedNprobe equals the live sweep's chosen depth (measurement→deployment wiring)") {
    // the constant q_knn_auto_tuned dials in must BE what the tune
    // chooses — a corpus/ladder change that moves the choice fails here
    // instead of silently serving a stale dial (the q_fusion_serve pin)
    IvfTune.chosenNprobe(spark, sfDir) shouldBe IvfTune.TunedNprobe
    // ...and on this corpus the chosen depth is the FULL fanout, which is
    // the measured precondition that lets q_knn_auto_tuned share the
    // exact-search oracle form (probed replay at full depth ≡ brute)
    IvfTune.TunedNprobe shouldBe IvfTune.TuneNprobes.max
  }

  test("q_knn_auto_tuned serves the exact top-10 (full-fanout route) and routes through the registry") {
    val tuned = VectorOps.knnAutoTuned(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    val exact = VectorOps.knn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    tuned.toSeq shouldBe exact.toSeq
  }

  test("trained sweep keeps the theorem gates: ladder order, monotone recall, exact full-depth anchor") {
    val tr = IvfTune.nprobeTuneTrained(spark, sfDir).collect()
    tr.map(_.getAs[Int]("nprobe")).toSeq shouldBe IvfTune.TuneNprobes
    val recalls = tr.map(_.getAs[Double]("recall_10")).toSeq
    recalls.zip(recalls.tail).foreach { case (a, b) => b should be >= a }
    tr.last.getAs[Double]("recall_10") shouldBe 1.0
  }

  test("Lloyd retraining lifts measured recall at every serving depth {2,4,8} at ALL THREE SFs") {
    // the measured fact q_nprobe_tune_trained exists to state (depth 1 at
    // the smallest SF can trade away — moved Voronoi boundaries shift
    // different queries' true neighbors out of the single probed bucket —
    // so the gate is the serving-depth band, not all depths)
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val seed = IvfTune.nprobeTune(spark, dir).collect()
        .map(r => r.getAs[Int]("nprobe") -> r.getAs[Double]("recall_10")).toMap
      val trained = IvfTune.nprobeTuneTrained(spark, dir).collect()
        .map(r => r.getAs[Int]("nprobe") -> r.getAs[Double]("recall_10")).toMap
      for (n <- Seq(2, 4, 8)) {
        withClue(s"sf$sf nprobe=$n trained=${trained(n)} seed=${seed(n)}:") {
          trained(n) should be >= seed(n)
        }
      }
    }
  }

  test("the sample excludes seed centroids and follows the declared modulus") {
    val nQ = rows.head.getAs[Long]("n_q")
    val expected = graft.Tables.embeddings(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id"))
      .count(id => id >= 16 && id % IvfTune.TuneSampleMod == IvfTune.TuneSampleRes)
    nQ shouldBe expected
    all(rows.map(_.getAs[Long]("n_q"))) shouldBe expected
  }
}
