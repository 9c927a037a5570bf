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

  test("ImageIoCodec really decodes PNG bytes (exact pixel dims); non-images fall back to the stub") {
    import spark.implicits._
    // synthesize real PNGs of known, distinct dimensions
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800) // non-uniform content
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val blobs = Seq(
      (1L, png(17, 23)),
      (2L, png(640, 2)),
      (3L, "definitely not an image".getBytes("UTF-8"))
    ).toDS()
    val decoded = Multimodal.decodePartitions(blobs, () => new Multimodal.ImageIoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    decoded(1L).width shouldBe 17L
    decoded(1L).height shouldBe 23L
    decoded(1L).n_frames shouldBe 1L
    decoded(2L).width shouldBe 640L
    decoded(2L).height shouldBe 2L
    // undecodable bytes: deterministic stub metadata, one bad row never
    // fails the partition
    val stub = new Multimodal.StubCodec()
      .decode(3L, "definitely not an image".getBytes("UTF-8"))
    decoded(3L) shouldBe stub
    // n_bytes is the raw blob size either way
    decoded(1L).n_bytes shouldBe png(17, 23).length.toLong
  }

  test("real resize: PNG in, target-dimension PNG out; non-images pass through") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 7919))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val notAnImage = "plain text".getBytes("UTF-8")
    val in = Seq((1L, png(64, 48)), (2L, notAnImage)).toDS()
    val out = Multimodal.resizePartitions(in, 16, 12).collect().toMap
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L)))
    resized.getWidth shouldBe 16
    resized.getHeight shouldBe 12
    out(2L) shouldBe notAnImage
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

  test("perceptual aHash dedup: near-identical images pair, different ones don't") {
    import spark.implicits._
    // deterministic gradient image; `tweak` flips a few pixels' brightness
    def png(seed: Int, tweak: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val v = (x * 4 + y * 0 + seed * 37) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      if (tweak) for (x <- 0 until 3; y <- 0 until 3) img.setRGB(x, y, 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val blobs = Seq(
      (1L, png(0, tweak = false)),
      (2L, png(0, tweak = true)),              // near-dup of 1
      (3L, png(3, tweak = false)),             // different gradient phase
      (4L, "not an image at all".getBytes),    // fallback path
      (5L, "not an image at all".getBytes)     // exact dup of 4 via sha-prefix
    ).toDS()
    val hashes = Multimodal.ahashPartitions(blobs)
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    val pairKeys = pairs.map(p => (p._1, p._2)).toSet
    pairKeys should contain((1L, 2L))   // small tweak stays within hamming 3
    pairKeys should contain((4L, 5L))   // identical non-images: hamming 0
    assert(!pairKeys.exists(p => p == ((1L, 3L)) || p == ((2L, 3L))),
      "distinct gradients must not pair")
    // hash determinism across evaluations
    val again = Multimodal.ahashPartitions(blobs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe again
  }

  test("q_image_neardup recovers exactly the 40 planted pairs at hamming 1") {
    // construction: ids 0-39 are 40 scrambled-pattern base images, ids
    // 40-79 repeat them with ONE 8×8 cell inverted — so the true near-dup
    // set is exactly {(g, g+40)} with aHash hamming 1, and any missing or
    // extra pair is a recall/precision failure of the real decode→hash→
    // banded-join path (not a threshold judgment call)
    val rows = MultimodalOps.imageNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    rows.toSeq shouldBe (0L until 40L).map(g => (g, g + 40L, 1L))
  }
}
