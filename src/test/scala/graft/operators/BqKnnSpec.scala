package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the binary-quantized search (VectorOps.bqKnn): the Hamming
  * shortlist must actually retrieve (recall vs exact brute force — the
  * PqIndexSpec discipline for the 1-bit family member), and the packed
  * signatures must be well-formed 32-bit words (the overflow-safety
  * argument for the two-word layout, checked, not assumed). */
class BqKnnSpec extends SparkSpecBase with Matchers {

  test("q_bq_knn: recall@10 vs exact brute force clears the two-stage gate") {
    val emb = KnnSearch.withNorm(graft.Tables.embeddings(spark, sfDir))
    val q = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val exact = KnnSearch.topK(emb, q, 10).select("vec_id").collect().map(_.getLong(0)).toSet
    val got = VectorOps.bqKnn(spark, sfDir).collect()
    got should have length 10
    val recall = got.map(_.getLong(0)).count(exact) / 10.0
    withClue(s"recall@10 ($recall):") { recall should be >= 0.8 }
    // exact rerank means emitted scores are true cosines, best-first
    val scores = got.map(_.getDouble(3))
    scores.toSeq shouldBe scores.sorted.reverse.toSeq
  }

  test("signatures are 32-bit words: every packed value in [0, 2^32), self-hamming is 0") {
    import graft.Tables
    val sig = Tables.embeddings(spark, sfDir)
      .withColumn("sig_lo", expr(
        "aggregate(sequence(0, 31), 0L, (acc, i) -> " +
          "acc + IF(element_at(embedding, i + 1) > 0.0D, shiftleft(1L, i), 0L))"))
      .withColumn("sig_hi", expr(
        "aggregate(sequence(0, 31), 0L, (acc, i) -> " +
          "acc + IF(element_at(embedding, i + 33) > 0.0D, shiftleft(1L, i), 0L))"))
    val bounds = sig.agg(
      min(least(col("sig_lo"), col("sig_hi"))).as("lo"),
      max(greatest(col("sig_lo"), col("sig_hi"))).as("hi")).head()
    bounds.getLong(0) should be >= 0L
    bounds.getLong(1) should be < (1L << 32)
    // hamming(x, x) = 0 — the xor/bit_count kernel is a metric at 0
    val self = sig.select(
      (bit_count(col("sig_lo").bitwiseXOR(col("sig_lo"))) +
        bit_count(col("sig_hi").bitwiseXOR(col("sig_hi")))).as("h"))
      .agg(max(col("h"))).head().getInt(0)
    self shouldBe 0
  }
}
