package graft.streaming

import graft.{SparkSpecBase, Tables}
import graft.operators.RandomHyperplaneLsh
import graft.sources.IndexCatalog
import graft.sources.IndexCatalog.IndexDescriptor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

case class VecUpdate(vec_id: Long, embedding: Array[Float], label: Int, version: Long)

/** Streaming index maintenance end-to-end: micro-batches of vector
  * updates merge into the persisted bucket-partitioned index and the
  * final state equals the batch-upsert semantics (last-write-wins,
  * moved vectors leave their old bucket). */
class VectorStreamSpec extends SparkSpecBase with Matchers {

  test("micro-batched vector updates maintain the persisted index incrementally") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-vstream").toString
    val emb = Tables.embeddings(spark, sfDir)
    val data = emb.withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), 64))
      .withColumn("version", lit(0L)) // stored: cross-batch LWW needs it
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("stream-idx", 64, "cosine"), data,
      partitionCols = Seq("bucket")) shouldBe true
    val n0 = IndexCatalog.load(spark, base, "stream-idx").count()

    val v0 = emb.filter(col("vec_id") === 0).head()
    val vec0 = v0.getSeq[Float](1).toArray
    val oldBucket0 = RandomHyperplaneLsh.bucketOf(vec0)

    val source = MemoryStream[VecUpdate]
    val query = VectorStream.start(source.toDF(), base, "stream-idx")
    try {
      // batch 1: move vec 0 (negate) + insert a new key; duplicate key in
      // the same batch resolves by version (the v2 negated vector wins)
      source.addData(
        VecUpdate(0L, vec0, 5, version = 1L),
        VecUpdate(0L, vec0.map(-_), 5, version = 2L),
        VecUpdate(424242L, vec0, 9, version = 1L))
      query.processAllAvailable()

      val mid = IndexCatalog.load(spark, base, "stream-idx")
      mid.count() shouldBe n0 + 1
      val bucket0AfterMove = mid.filter(col("vec_id") === 0)
        .head().getAs[Number]("bucket").longValue
      bucket0AfterMove shouldBe RandomHyperplaneLsh.bucketOf(vec0.map(-_))
      assert(bucket0AfterMove != oldBucket0)

      // batch 2: move vec 0 back — successive micro-batches are successive
      // merges (the second batch sees the first batch's index state)
      source.addData(VecUpdate(0L, vec0, 5, version = 3L))
      query.processAllAvailable()

      val fin = IndexCatalog.load(spark, base, "stream-idx")
      fin.count() shouldBe n0 + 1
      fin.filter(col("vec_id") === 0).head()
        .getAs[Number]("bucket").longValue shouldBe oldBucket0
      // the streamed insert is searchable through the catalog API
      val q = fin.filter(col("vec_id") === 424242L)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
      IndexCatalog.search(spark, base, "stream-idx", q, 3,
        buckets = Seq(oldBucket0)).count() should be > 0L
    } finally query.stop()
  }

  test("equal-version duplicate keys resolve deterministically (retry idempotency)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-vstream-tie").toString
    val emb = Tables.embeddings(spark, sfDir)
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("tie-idx", 64, "cosine"),
      emb.withColumn("bucket",
          RandomHyperplaneLsh.bucket(org.apache.spark.sql.functions.col("embedding"), 64))
        .withColumn("version", lit(0L)),
      partitionCols = Seq("bucket")) shouldBe true
    val vec = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray

    // the same duplicated (key, version) batch applied to two fresh copies
    // of the index must produce the SAME winner — the contract a
    // foreachBatch retry relies on
    def applyBatch(name: String): Int = {
      val src = MemoryStream[VecUpdate]
      val q = VectorStream.start(src.toDF(), base, name)
      try {
        src.addData(
          VecUpdate(0L, vec, 111, version = 9L),
          VecUpdate(0L, vec.map(-_), 222, version = 9L))
        q.processAllAvailable()
      } finally q.stop()
      IndexCatalog.load(spark, base, name)
        .filter(col("vec_id") === 0).head().getAs[Int]("label")
    }
    IndexCatalog.createIfAbsent(spark, base,
      IndexCatalog.IndexDescriptor("tie-idx2", 64, "cosine"),
      emb.withColumn("bucket",
          RandomHyperplaneLsh.bucket(org.apache.spark.sql.functions.col("embedding"), 64))
        .withColumn("version", lit(0L)),
      partitionCols = Seq("bucket")) shouldBe true
    applyBatch("tie-idx") shouldBe applyBatch("tie-idx2")
  }

  test("a stale version redelivered in a LATER micro-batch cannot regress the key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-vstream-ooo").toString
    val emb = Tables.embeddings(spark, sfDir)
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("ooo-idx", 64, "cosine"),
      emb.withColumn("bucket",
          RandomHyperplaneLsh.bucket(org.apache.spark.sql.functions.col("embedding"), 64))
        .withColumn("version", lit(0L)),
      partitionCols = Seq("bucket")) shouldBe true
    val vec = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray

    val src = MemoryStream[VecUpdate]
    val q = VectorStream.start(src.toDF(), base, "ooo-idx")
    try {
      // v2 arrives FIRST, then an at-least-once source redelivers v1 in a
      // LATER micro-batch — out-of-order delivery across batch boundaries.
      // Arrival-order (batch-beats-index) semantics would regress the key
      // to the stale payload; version-aware merge must keep v2.
      src.addData(VecUpdate(0L, vec, 200, version = 2L))
      q.processAllAvailable()
      src.addData(VecUpdate(0L, vec, 100, version = 1L))
      q.processAllAvailable()
    } finally q.stop()
    IndexCatalog.load(spark, base, "ooo-idx")
      .filter(col("vec_id") === 0).head().getAs[Int]("label") shouldBe 200
  }
}
