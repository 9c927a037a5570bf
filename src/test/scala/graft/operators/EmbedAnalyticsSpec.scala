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

  test("q_margin_mine: odd→even best matches, margins positive and ordered, hub normalization changes the ranking") {
    import org.apache.spark.sql.functions.col
    val mined = EmbedAnalytics.marginMine(spark, sfDir)
    // the 100 TB property (the q_knn_join_large precedent): no side of
    // any join carries a STATIC broadcast — the candidate join is the
    // hinted bucket merge join, and the neighborhood-stat joins are
    // key-partitioned shuffles (corpus-sized at scale; only AQE may
    // elect a runtime broadcast from measured sizes)
    val plan = mined.queryExecution.executedPlan.toString
    plan should not include "BroadcastExchange"
    plan should include("SortMergeJoin")
    val rows = mined.collect()
    rows.length shouldBe 20
    rows.foreach { r =>
      (r.getAs[Long]("src_id") % 2) shouldBe 1L
      (r.getAs[Long]("tgt_id") % 2) shouldBe 0L
      r.getAs[Double]("margin") should be > 0.0
    }
    val margins = rows.map(_.getAs[Double]("margin"))
    margins.toSeq shouldBe margins.sortBy(-_).toSeq
    // the criterion's reason to exist: margin order is NOT raw cosine
    // order (hub endpoints are discounted by their own neighborhoods) —
    // on a corpus where they coincided the normalization would be inert
    val byCos = rows.sortBy(r => (-r.getAs[Double]("cos"), r.getAs[Long]("src_id")))
      .map(_.getAs[Long]("src_id")).toSeq
    byCos should not be rows.map(_.getAs[Long]("src_id")).toSeq
  }

  test("q_mrl_knn: exact rerank ordering, and the measured shortlist recovers >=0.9 of brute top-10") {
    import org.apache.spark.sql.functions.col
    val served = EmbedAnalytics.mrlKnn(spark, sfDir).collect()
    served.length shouldBe 10
    // the served ranking is the EXACT score's (prefix only shortlists)
    val scores = served.map(_.getAs[Double]("score"))
    scores.toSeq shouldBe scores.sortBy(-_).toSeq
    // recall gate vs brute truth (the q_graph_ann discipline: measured,
    // 0.9-1.0 at all three SFs for d=32/S=200 — the dials q_mrl_eval's
    // cliff measurement justifies on this corpus)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val brute = KnnSearch.topK(KnnSearch.withNorm(emb),
      emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")),
      10).select("vec_id").collect().map(_.getLong(0)).toSet
    val hits = served.map(_.getAs[Long]("vec_id")).count(brute)
    hits.toDouble / 10 should be >= 0.9
  }

  test("q_mrl_eval: valid recalls, 1.0 at full dimension, and a real cliff on untrained prefixes") {
    val rows = EmbedAnalytics.mrlEval(spark, sfDir).collect()
    rows.map(_.getAs[Int]("dim")).toSeq shouldBe EmbedAnalytics.MrlDims
    val recalls = rows.map(_.getAs[Double]("recall_10"))
    all(recalls) should (be >= 0.0 and be <= 1.0)
    recalls.last shouldBe 1.0 // full dimension is the sanity anchor
    // the testdata's embeddings are NOT matryoshka-trained, so short
    // prefixes must lose most of the top-10 — this measured cliff is the
    // query's point: it VETOES prefix serving on a corpus like this one
    // (monotonicity in d is a property of MRL-trained models, not of
    // arbitrary embeddings, and is deliberately not asserted)
    recalls.head should be < 0.8
  }
}
