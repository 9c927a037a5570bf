package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Recall audit for FILTERED ANN (the candidateFilter path of
  * [[IvfIndex.search]], q_ann_filtered / q_knn_meta's family) against
  * filtered brute-force truth — the number a store must publish next to
  * its unfiltered recall, because filtering CHANGES the recall picture: a
  * matching vector in an unprobed bucket is unreachable, and the fewer
  * candidates survive the filter, the more each miss costs.
  *
  * Same planted-neighbor discipline as LshRecallSpec (raw testdata
  * embeddings are near-orthogonal, so "nearest" is bucket-uncorrelated
  * noise): each query gets 5 deterministically perturbed SAME-LABEL
  * copies (θ ≈ 8°), and filtered recall@5 asks whether the probed +
  * filtered search finds them. */
class FilteredRecallSpec extends SparkSpecBase with Matchers {

  private val K = 5
  private val NQueries = 25

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

  private lazy val centroids: DataFrame =
    KnnSearch.withNorm(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")),
      "c_embedding").withColumnRenamed("vec_norm", "c_norm")

  test("filtered IVF recall@5 on planted same-label neighbors (recorded in SCALE.md)") {
    val emb = Tables.embeddings(spark, sfDir)
    val assigned = IvfIndex.assign(haystack, centroids).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue))
    val overlaps = queries.map { case (qid, qLabel) =>
      val q = KnnSearch.withNorm(
        emb.filter(col("vec_id") === qid)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")),
        "q_embedding").withColumnRenamed("vec_norm", "q_norm")
      val brute = KnnSearch.topK(haystack.filter(col("label") === qLabel), q, K)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val ann = IvfIndex.search(assigned, centroids, q, nprobe = 4, k = K,
          candidateFilter = col("label") === qLabel)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      ann.intersect(brute).size.toDouble / K
    }
    val recall = overlaps.sum / NQueries
    info(f"filtered recall@5 (IVF nprobe=4, planted same-label neighbors): $recall%.3f")
    // planted copies sit at ~8 deg from their query — the query's probe set
    // should cover them; the floor documents the measured envelope
    recall should be >= 0.9
  }

  test("planted miss: a matching vector in an unprobed bucket is unreachable (recall 0.5 exactly)") {
    import spark.implicits._
    // 2 orthogonal centroids; query = e1; nprobe = 1 probes bucket 0 only.
    // Both haystack vectors match the filter (label 7) and BOTH make the
    // filtered brute top-2, but vb lives in bucket 1 (it leans e2):
    //   va = (0.9, 0.1, 0, 0)  -> bucket 0, cos(q, va) ~ 0.994
    //   vb = (0.4, 0.9, 0, 0)  -> bucket 1, cos(q, vb) ~ 0.406
    // nprobe=1 finds va, misses vb -> filtered recall@2 = 0.5. This is
    // the documented approximation the audit must catch, not a bug.
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val cent = KnnSearch.withNorm(
      Seq((0L, vec(1, 0, 0, 0)), (1L, vec(0, 1, 0, 0)))
        .toDF("cent_id", "c_embedding"),
      "c_embedding").withColumnRenamed("vec_norm", "c_norm")
    val idx = KnnSearch.withNorm(
      Seq((10L, 7L, vec(0.9, 0.1, 0, 0)), (11L, 7L, vec(0.4, 0.9, 0, 0)),
          (12L, 8L, vec(0.95, 0.05, 0, 0))) // matches the angle, not the filter
        .toDF("vec_id", "label", "embedding"))
    val q = KnnSearch.withNorm(
      Seq((99L, vec(1, 0, 0, 0))).toDF("q_id", "q_embedding"),
      "q_embedding").withColumnRenamed("vec_norm", "q_norm")
    val assigned = IvfIndex.assign(idx, cent)
    val brute = KnnSearch.topK(idx.filter(col("label") === 7), q, 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    brute shouldBe Set(10L, 11L)
    val ann = IvfIndex.search(assigned, cent, q, nprobe = 1, k = 2,
        candidateFilter = col("label") === 7)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    ann shouldBe Set(10L) // vb unreachable: its bucket is not probed
    ann.intersect(brute).size.toDouble / 2 shouldBe 0.5
  }
}
