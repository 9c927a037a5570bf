package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends SparkSpecBase with Matchers {

  test("mapPartitions stub codec agrees with the expression-based decode") {
    import spark.implicits._
    val blobs = Tables.documents(spark, sfDir).limit(50)
      .select(col("doc_id"), Multimodal.toBlob(col("text")).as("blob"))
    val viaPartitions = Multimodal.decodePartitions(
      blobs.as[(Long, Array[Byte])])
      .collect().map(m => (m.doc_id, (m.n_bytes, m.width, m.height, m.n_frames))).toMap
    val viaExpr = blobs.withColumn("m", Multimodal.decodeStub(col("blob")))
      .select(col("doc_id"), col("m.n_bytes"), col("m.width"), col("m.height"), col("m.n_frames"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    viaPartitions shouldBe viaExpr
  }

  test("resize stub shrinks the blob to the pixel budget with new dimensions") {
    import spark.implicits._
    val one = Seq((1L, "x" * 1000)).toDF("doc_id", "text")
      .select(col("doc_id"), Multimodal.toBlob(col("text")).as("blob"))
    val r = one.select(Multimodal.resizeStub(col("blob"), 10, 10).as("r"))
      .select(col("r.blob"), col("r.width"), col("r.height")).head()
    r.getAs[Array[Byte]](0).length should be <= 100
    r.getAs[Array[Byte]](0).length should be > 0
    r.getLong(1) shouldBe 10L
    r.getLong(2) shouldBe 10L
    // deterministic: same input, same output
    val again = one.select(Multimodal.resizeStub(col("blob"), 10, 10).getField("blob")).head()
    again.getAs[Array[Byte]](0) shouldBe r.getAs[Array[Byte]](0)
  }

  test("frame sampling slices n windows out of the blob") {
    import spark.implicits._
    val one = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text")
      .select(col("doc_id"), Multimodal.toBlob(col("text")).as("blob"))
    val frames = one.select(Multimodal.frameSample(col("blob"), 4, 3).as("f"))
      .head().getSeq[Array[Byte]](0)
    frames.length shouldBe 4
    new String(frames.head) shouldBe "abc"
    all(frames.map(_.length)) should be <= 3
  }
}
