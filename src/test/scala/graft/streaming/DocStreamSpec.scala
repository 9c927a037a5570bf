package graft.streaming

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

case class Doc(doc_id: Long, text: String)

/** Streaming corpus ingestion end-to-end: micro-batches append only
  * genuinely new documents, replays append nothing, and the final corpus
  * equals batch exact-dedup over everything ever sent (stream == batch,
  * the EventsStream discipline). */
class DocStreamSpec extends SparkSpecBase with Matchers {

  test("micro-batched ingestion dedupes incrementally, idempotently, and matches batch dedup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val path = java.nio.file.Files.createTempDirectory("graft-docstream")
      .resolve("corpus").toString
    val source = MemoryStream[Doc]
    val query = DocStream.start(source.toDF(), path)
    try {
      // batch 1: one in-batch duplicate pair (lowest id wins)
      source.addData(Doc(1, "alpha beta gamma"), Doc(2, "delta epsilon"),
        Doc(3, "alpha beta gamma"))
      query.processAllAvailable()
      val c1 = spark.read.parquet(path)
      c1.count() shouldBe 2
      c1.filter(col("text") === "alpha beta gamma")
        .head().getAs[Long]("doc_id") shouldBe 1L

      // batch 2: one cross-batch duplicate, one new doc
      source.addData(Doc(4, "delta epsilon"), Doc(5, "zeta eta theta"))
      query.processAllAvailable()
      spark.read.parquet(path).count() shouldBe 3

      // batch 3: a full replay of batch 1 — the anti-join makes the
      // retry a no-op (the exactly-once mechanism)
      source.addData(Doc(1, "alpha beta gamma"), Doc(2, "delta epsilon"),
        Doc(3, "alpha beta gamma"))
      query.processAllAvailable()
      val fin = spark.read.parquet(path)
      fin.count() shouldBe 3

      // stream == batch: the corpus equals exact-dedup over everything sent
      val everything = Seq(
        Doc(1, "alpha beta gamma"), Doc(2, "delta epsilon"),
        Doc(3, "alpha beta gamma"), Doc(4, "delta epsilon"),
        Doc(5, "zeta eta theta")).toDF()
      val batchDedup = Dedup.exact(everything)
        .select("doc_id", "text").collect().map(_.toString).sorted
      fin.select("doc_id", "text").collect().map(_.toString).sorted shouldBe batchDedup

      // null text fingerprints as the empty string: it appends once and a
      // replay appends nothing (a NULL fp would never match the anti-join
      // and re-append forever)
      source.addData(Doc(6, null), Doc(7, null))
      query.processAllAvailable()
      spark.read.parquet(path).count() shouldBe 4
      source.addData(Doc(6, null))
      query.processAllAvailable()
      spark.read.parquet(path).count() shouldBe 4
    } finally query.stop()
  }
}
