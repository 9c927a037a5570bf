package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class VectorFunctionsSpec extends SparkSpecBase with Matchers {
  import VectorFunctions._

  private def vecDf(vs: (Long, Seq[Float])*) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      java.util.Arrays.asList(vs.map { case (i, v) => Row(i, v) }: _*), schema)
  }

  test("sparse roundtrip: toDense(toSparse(v, 0)) == v and self-dot matches dense") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(50)
    val rt = emb.select(col("vec_id"), col("embedding"),
      SparseVectors.toDense(SparseVectors.toSparse(col("embedding"), 0.0), 64).as("back"),
      SparseVectors.sparseSelfDot(SparseVectors.toSparse(col("embedding"), 0.0)).as("sdot"),
      VectorFunctions.dotProduct(col("embedding"), col("embedding")).as("ddot"))
    val rows = rt.collect()
    rows.foreach { r =>
      r.getSeq[Float](2) shouldBe r.getSeq[Float](1)
      r.getDouble(3) shouldBe r.getDouble(4) +- 1e-9
    }
    // thresholded: strictly fewer stored elements, 0-based indices in range
    val sp = emb.select(SparseVectors.toSparse(col("embedding"), 0.5).as("sp"))
      .select(col("sp.indices").as("idx"), col("sp.values").as("v")).collect()
    sp.foreach { r =>
      val idx = r.getSeq[Int](0)
      idx.size shouldBe r.getSeq[Float](1).size
      all(idx) should (be >= 0 and be < 64)
      idx shouldBe idx.sorted
    }
    sp.map(_.getSeq[Int](0).size).sum should be < 50 * 64
  }

  test("cosine of a vector with itself is 1") {
    val df = vecDf((1L, Seq(1f, 2f, 3f)), (2L, Seq(-0.5f, 0.25f, 8f)))
    val scores = df.select(cosineSim(col("v"), col("v")).as("s"))
      .collect().map(_.getDouble(0))
    all(scores) shouldBe 1.0 +- 1e-12
  }

  test("cosine is symmetric and matches a hand-computed value") {
    val df = vecDf((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    val a = df.filter(col("id") === 1).select(col("v").as("a"))
    val b = df.filter(col("id") === 2).select(col("v").as("b"))
    val ab = a.crossJoin(b)
    val s1 = ab.select(cosineSim(col("a"), col("b"))).head().getDouble(0)
    val s2 = ab.select(cosineSim(col("b"), col("a"))).head().getDouble(0)
    s1 shouldBe 0.0 +- 1e-12
    s1 shouldBe s2
  }

  test("native expressions equal the declarative higher-order form bit-for-bit") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(50)
    val hofDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, x) => s + x)
    val pairs = emb.select(col("embedding").as("a"), col("vec_id").as("ia"))
      .crossJoin(emb.select(col("embedding").as("b"), col("vec_id").as("ib")))
      .filter(col("ia") < col("ib"))
    val diffs = pairs.select(
      (dotProduct(col("a"), col("b")) - hofDot).as("d"),
      (l2Norm(col("a")) - sqrt(aggregate(col("a"), lit(0.0),
        (s, x) => s + x.cast("double") * x.cast("double")))).as("dn"))
      .agg(max(abs(col("d"))), max(abs(col("dn")))).head()
    diffs.getDouble(0) shouldBe 0.0
    diffs.getDouble(1) shouldBe 0.0
  }

  test("l2 distance: zero to self, positive and symmetric otherwise") {
    val df = vecDf((1L, Seq(3f, 4f)))
    df.select(l2Dist(col("v"), col("v"))).head().getDouble(0) shouldBe 0.0
    val two = vecDf((1L, Seq(0f, 0f))).select(col("v").as("a"))
      .crossJoin(vecDf((2L, Seq(3f, 4f))).select(col("v").as("b")))
    two.select(l2Dist(col("a"), col("b"))).head().getDouble(0) shouldBe 5.0 +- 1e-12
  }

  test("normalize yields unit vectors") {
    val df = vecDf((1L, Seq(3f, 4f)))
    val n = df.select(l2Norm(normalize(col("v")))).head().getDouble(0)
    n shouldBe 1.0 +- 1e-9
  }
}
