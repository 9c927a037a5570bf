package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.matchers.should.Matchers

/** Semantics of the DEFLATE-compressibility kernel: the quality-signal
  * ordering (boilerplate compresses better than varied text), determinism
  * across evaluations, and byte accounting (raw_bytes counts UTF-8 bytes,
  * deflated output is non-empty even for empty input — zlib's stream
  * framing — so the query-side ratio guards on raw_bytes, not deflated). */
class DeflateStatsSpec extends SparkSpecBase with Matchers {

  private def stats(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        ColumnBridge.column(DeflateStats(ColumnBridge.expression(col("text")))).as("s"))
      .select(col("id"), col("s.raw_bytes"), col("s.deflated_bytes"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
  }

  test("boilerplate compresses to fewer bytes than varied text of equal length") {
    val boiler = "spam spam " * 40                        // 400 chars, one token
    val varied = (0 until 40).map(i => f"w${i * 7919}%08d ").mkString
    varied.length shouldBe boiler.length
    val Seq((rawB, defB), (rawV, defV)) = stats(Seq(boiler, varied)).toSeq
    rawB shouldBe rawV
    assert(defB < defV,
      s"boilerplate deflated to $defB, varied to $defV — expected boiler < varied")
  }

  test("deterministic across evaluations and rows; multi-byte UTF-8 counted as bytes") {
    val texts = Seq("hello world", "hello world", "שלום עולם")
    val out = stats(texts)
    out(0) shouldBe out(1)
    out shouldBe stats(texts) // re-run, same plan → same bytes
    // Hebrew: 8 letters × 2 bytes + 1 space = 17 raw bytes, not 9 chars
    out(2)._1 shouldBe 17L
  }

  test("empty string: zero raw bytes, nonzero framing; nulls propagate") {
    import spark.implicits._
    val out = Seq((1L, ""), (2L, null: String)).toDF("id", "text")
      .select(col("id"),
        ColumnBridge.column(DeflateStats(ColumnBridge.expression(col("text")))).as("s"))
      .orderBy(col("id")).collect()
    val empty = out(0).getStruct(1)
    empty.getLong(0) shouldBe 0L
    assert(empty.getLong(1) > 0L, "DEFLATE of empty input still emits stream framing")
    assert(out(1).isNullAt(1), "null input must yield null stats, not a crash")
  }
}
