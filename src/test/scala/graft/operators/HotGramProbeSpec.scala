package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Scale probe for the exact-substring span dedup (q_dedup_spans): a HOT
  * gram — one boilerplate window planted in 10⁴ documents — is the
  * workload that breaks a pair-join formulation (10⁴ postings → 10⁸
  * candidate pairs for that one gram). The count-window formulation's
  * cost is the POSTING COUNT, linearly: the hot gram's partition holds
  * 10⁴ rows, buffered/spilled by one window, never joined against
  * itself. The probe asserts completion, the exact output (one span per
  * planted doc), and the plan shape (no join, bounded exchanges); the
  * measured time is quoted in SCALE.md as the hot-gram bound. */
class HotGramProbeSpec extends SparkSpecBase with Matchers {

  test("hot gram in 10^4 docs: completes linearly, no pair join, one span per doc") {
    val n = 10000L
    // 8 hot tokens (= SpanGram, one shared window) + 2 per-doc unique
    // tokens: each doc contributes exactly ONE posting to the hot gram's
    // partition and its other windows stay unique corpus-wide
    val hot = "alpha beta gamma delta epsilon zeta eta theta"
    val planted = spark.range(n).select(
      (col("id") + 1000000L).as("doc_id"),
      concat(lit(hot), lit(" u"), col("id"), lit("x u"), col("id"), lit("y"))
        .as("text"))
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .unionByName(planted)

    val spans = Dedup.duplicateSpans(corpus)
    val t0 = System.nanoTime()
    spans.write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"hot-gram probe: 10^4-posting gram over ${n + 50} docs in $secs%.2f s")

    // one span per planted doc, exactly the hot window [0, 7]
    val plantedSpans = spans.filter(col("doc_id") >= 1000000L)
    plantedSpans.count() shouldBe n
    plantedSpans.agg(
        min(col("span_start")).as("a"), max(col("span_start")).as("b"),
        min(col("span_end")).as("c"), max(col("span_end")).as("d"),
        max(col("n_dup_grams")).as("e"))
      .head().toSeq shouldBe Seq(0L, 0L, 7L, 7L, 1L)

    // plan shape: the hot gram must never self-join — flag via ONE count
    // window (S(gram)), merge via ONE islands window (S(doc_id)), plus
    // the deterministic output sort; no join operator anywhere
    val plan = spans.queryExecution.executedPlan.toString
    plan should not include "Join"
    "Exchange hashpartitioning".r.findAllIn(plan).size should be <= 2
  }
}
