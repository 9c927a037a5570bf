package graft.operators

import graft.{SparkSpecBase, Tables}
import org.scalatest.matchers.should.Matchers

/** Structural gates for the embedding-analytics suite; value correctness
  * is oracle-gated (all four declared queries hash-match DuckDB). */
class EmbedAnalyticsSpec extends SparkSpecBase with Matchers {

  test("label centroids cover every vector and have the index dimension") {
    val rows = EmbedAnalytics.labelCentroids(spark, sfDir).collect()
    rows.map(_.getAs[Long]("n_vectors")).sum shouldBe
      Tables.embeddings(spark, sfDir).count()
    all(rows.map(_.getSeq[Double](rows.head.fieldIndex("centroid")).length)) shouldBe 64
  }

  test("declared flat shape carries exactly the array form's values, all-scalar") {
    val flat = EmbedAnalytics.labelCentroidsFlat(spark, sfDir)
    flat.schema.fields.foreach(f =>
      f.dataType.typeName should (be("long") or be("integer") or be("double")))
    val byLabel = flat.collect().groupBy(_.getAs[Int]("label"))
    EmbedAnalytics.labelCentroids(spark, sfDir).collect().foreach { r =>
      val rows = byLabel(r.getAs[Int]("label")).sortBy(_.getAs[Long]("pos"))
      rows.map(_.getAs[Double]("m")).toSeq shouldBe
        r.getSeq[Double](r.fieldIndex("centroid"))
      all(rows.map(_.getAs[Long]("n_vectors"))) shouldBe r.getAs[Long]("n_vectors")
    }
  }

  test("hard negatives never share the query's label and rank densely") {
    val labels = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = EmbedAnalytics.hardNegatives(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (qId, group) =>
      group.map(_.getAs[Int]("rank")).sorted shouldBe (1 to 5)
      group.foreach { r =>
        r.getAs[Int]("label") should not be labels(qId)
      }
    }
  }

  test("outliers are the ascending tail of the centroid-cosine distribution") {
    val rows = EmbedAnalytics.embedOutliers(spark, sfDir).collect()
    rows.length shouldBe 20
    val scores = rows.map(_.getAs[Double]("centroid_cos"))
    scores.toSeq shouldBe scores.sorted.toSeq
  }
}
