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

  test("q_embed_procrustes: recovered rotation is orthogonal and matches the planted Givens blocks") {
    val r0 = EmbedPca.plantedRotation
    val rows = EmbedPca.embedProcrustes(spark, sfDir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    // every significant planted entry recovered within FP-solve tolerance
    for (i <- 0 until 64; j <- 0 until 64 if math.abs(r0(i)(j)) >= 0.01) {
      withClue(s"R[$i][$j]:") {
        math.abs(rows.getOrElse((i, j), 0.0) - r0(i)(j)) should be < 1e-3
      }
    }
    // orthogonality: reconstruct the dense matrix and check RᵀR ≈ I on
    // a few columns (the declared rows carry every entry ≥ 0.001, which
    // is the whole 2x2 block structure)
    val rec = Array.tabulate(64, 64)((i, j) => rows.getOrElse((i, j), 0.0))
    for (c <- Seq(0, 7, 31, 63)) {
      val norm = (0 until 64).map(i => rec(i)(c) * rec(i)(c)).sum
      norm shouldBe 1.0 +- 1e-3
      val dot = (0 until 64).map(i => rec(i)(c) * rec(i)((c + 2) % 64)).sum
      math.abs(dot) should be < 1e-3
    }
  }
}
