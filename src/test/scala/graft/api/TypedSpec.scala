package graft.api

import graft.{SparkSpecBase, Tables}
import graft.operators.{IvfIndex, KnnSearch}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class TypedSpec extends SparkSpecBase with Matchers {

  test("typed datasets expose the tables with compile-checked fields") {
    val docs = Typed.documents(spark, sfDir)
    docs.filter(_.lang == "en").count() should be > 0L
    val emb = Typed.embeddings(spark, sfDir)
    emb.map(e => e.embedding.length)(org.apache.spark.sql.Encoders.scalaInt)
      .distinct().collect() shouldBe Array(64)
    val ev = Typed.events(spark, sfDir)
    ev.filter(_.event_type == "purchase").count() should be > 0L
  }

  test("VectorMean aggregator computes the element-wise mean") {
    import spark.implicits._
    val data = Seq(
      (1L, Array(1f, 2f, 3f)), (1L, Array(3f, 4f, 5f)),
      (2L, Array(10f, 10f, 10f))).toDS()
    val res = data.groupByKey(_._1).mapValues(_._2)
      .agg(new Typed.VectorMean(3).toColumn.name("mean"))
      .collect().toMap
    res(1L) shouldBe Array(2f, 3f, 4f)
    res(2L) shouldBe Array(10f, 10f, 10f)
  }

  test("k-means training improves (or preserves) mean best-centroid cosine") {
    val emb = Tables.embeddings(spark, sfDir)
    val indexed = KnnSearch.withNorm(emb)
    def quality(cent: org.apache.spark.sql.DataFrame): Double =
      IvfIndex.assign(indexed, cent)
        .join(cent, "cent_id")
        .withColumn("s", graft.functions.VectorFunctions.cosineSim(
          col("embedding"), col("c_embedding")))
        .agg(avg(col("s"))).head().getDouble(0)
    val seed = KnnSearch.withNorm(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")),
      "c_embedding").withColumnRenamed("vec_norm", "c_norm")
    val trained = IvfIndex.trainCentroids(emb, k = 8, dim = 64, iterations = 2)
    trained.count() should be <= 8L
    quality(trained) should be >= quality(seed) - 1e-9
  }
}
