package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for embedding-space alignment (q_embed_align): the cross-
  * covariance argmax must recover the planted signed permutation
  * exactly, and applying the recovered mapping must reproduce the source
  * space bit-for-bit (the "no reindex needed" claim).
  */
class AlignSpec extends SparkSpecBase with Matchers {

  test("recovered mapping equals the planted signed permutation; applying it inverts the drift") {
    val rows = EmbedPca.embedAlign(spark, sfDir).collect()
    rows.length shouldBe 64
    rows.foreach { r =>
      val (b, a, s) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getInt(2))
      withClue(s"target dim $b:") {
        a shouldBe EmbedPca.alignPerm(b)
        s.toDouble shouldBe EmbedPca.alignSign(b)
      }
    }
    // apply: reconstruct a[perm(b)] = sign(b) * target[b] on a sample row
    // — the mapping must invert the drift EXACTLY (floats survive the
    // ±1 multiplication unchanged)
    val src = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 5L)
      .select(col("embedding")).head().getSeq[Float](0)
    val drifted = (0 until 64).map(j => EmbedPca.alignSign(j).toFloat * src(EmbedPca.alignPerm(j)))
    val mapping = rows.map(r => r.getLong(0).toInt -> (r.getLong(1).toInt, r.getInt(2))).toMap
    val restored = Array.fill(64)(0f)
    mapping.foreach { case (b, (a, s)) => restored(a) = s * drifted(b) }
    restored.toSeq shouldBe src
  }
}
