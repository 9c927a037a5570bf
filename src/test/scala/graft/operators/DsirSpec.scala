package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the importance-resampling selector (CorpusOps.dsir): the
  * selection must actually tilt toward the target distribution (the
  * whole point of the method), weights must be finite, and the
  * decimal-summed pipeline must be run-to-run deterministic. */
class DsirSpec extends SparkSpecBase with Matchers {

  test("q_dsir: selected docs are target-enriched vs the corpus base rate") {
    val docs = Tables.documents(spark, sfDir)
    val baseRate = docs.agg(
      avg(when(col("lang") === "en", 1.0).otherwise(0.0))).head().getDouble(0)
    val top = CorpusOps.dsir(spark, sfDir).collect()
    top should have length CorpusOps.DsirKeep
    val topRate = top.count(_.getString(1) == "en").toDouble / top.length
    withClue(s"top-${top.length} en-rate $topRate vs corpus $baseRate:") {
      topRate should be > baseRate
    }
    top.foreach { r =>
      val w = r.getDouble(2)
      withClue(s"doc ${r.getLong(0)} weight:") {
        java.lang.Double.isFinite(w) shouldBe true
      }
    }
    // ranked best-first with the declared tiebreak
    val ws = top.map(_.getDouble(2))
    ws.toSeq shouldBe ws.sorted.reverse.toSeq
  }

  test("q_dsir: deterministic across runs (decimal-exact per-doc sums)") {
    val a = CorpusOps.dsir(spark, sfDir).collect().map(r => (r.getLong(0), r.getDouble(2)))
    val b = CorpusOps.dsir(spark, sfDir).collect().map(r => (r.getLong(0), r.getDouble(2)))
    a.toSeq shouldBe b.toSeq
  }
}
