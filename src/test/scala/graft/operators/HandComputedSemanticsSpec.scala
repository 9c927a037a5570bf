package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** Hand-computed expectations for the temporal/window operators.
  *
  * The DuckDB oracle mirrors each operator's formula, so it cannot catch a
  * WRONG formula both sides share (exactly how the degenerate-MinHash bug
  * slipped past parity). These tests pin the intended semantics — tie
  * handling, boundary inclusion, session-gap edges — against inputs small
  * enough to verify by hand.
  */
class HandComputedSemanticsSpec extends SparkSpecBase with Matchers {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def eventsDf(rows: (Long, String, Long, String, Double)*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, t, u, ty, v) =>
        Row(id, ts(t), u, ty, v, "{}")
      }: _*),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))

  test("sessionize: a gap of exactly 30 minutes does NOT open a new session; 30min+1us does") {
    val events = eventsDf(
      (1L, "2024-01-01 10:00:00", 7L, "click", 1.0),
      (2L, "2024-01-01 10:30:00", 7L, "click", 1.0), // gap == 30min → same session
      (3L, "2024-01-01 11:00:00.000001", 7L, "click", 1.0)) // 30min + 1us → new session
    val sessions = EventOps.sessionCountsPerUser(events, gapSecs = 1800L)
      .head().getLong(1)
    sessions shouldBe 2L
  }

  test("as-of join: exact-timestamp ties match (at-or-before), and right ties resolve to highest id") {
    val events = eventsDf(
      (10L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (11L, "2024-01-01 10:05:00", 1L, "click", 0.0), // two clicks, same user
      (12L, "2024-01-01 10:05:00", 1L, "click", 0.0), // tie with 11 at same ts
      (20L, "2024-01-01 10:05:00", 1L, "purchase", 9.0), // purchase AT click time → ties match
      (21L, "2024-01-01 10:01:00", 1L, "purchase", 9.0), // between clicks → matches click 10
      (30L, "2024-01-01 09:00:00", 2L, "purchase", 9.0)) // user with no clicks → null
    val result = AsofJoin.lastEventBefore(events, "purchase", "click")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    result(20L) shouldBe 12L // at-or-before includes the tie; highest click id wins
    result(21L) shouldBe 10L
    result(30L) shouldBe -1L // no prior click → null
  }

  test("range join: a neighbor at exactly the window boundary is included; one micro past is not") {
    val events = eventsDf(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 0.0),
      (2L, "2024-01-01 10:10:00", 1L, "click", 0.0), // exactly +600s → included
      (3L, "2024-01-01 09:50:00", 1L, "click", 0.0), // exactly -600s → included
      (4L, "2024-01-01 10:10:00.000001", 1L, "click", 0.0), // 600s + 1us → excluded
      (5L, "2024-01-01 10:00:00", 2L, "click", 0.0)) // same time, other user → excluded
    val n = RangeJoin.countWithin(events, "purchase", "click", 600L)
      .head().getLong(2)
    n shouldBe 2L
  }

  test("tumbling window: an event exactly on the hour belongs to the window it starts") {
    val events = eventsDf(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0), // starts the 10:00 bucket
      (2L, "2024-01-01 09:59:59.999999", 1L, "click", 1.0)) // last micro of 09:00 bucket
    val buckets = events
      .groupBy(window(col("ts"), "1 hour")).count()
      .select(date_format(col("window.start"), "HH:mm").as("b"), col("count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    buckets shouldBe Map("10:00" -> 1L, "09:00" -> 1L)
  }

  test("chat fold: continuations attach to the preceding header, never the following one") {
    val lines = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, "[09.09.23, 14:35:02] ~ a: first"),
        Row(1L, "continuation of first"),
        Row(2L, "[09.09.23, 14:36:00] ~ b: second")),
      StructType(Seq(StructField("line_no", LongType), StructField("line", StringType))))
    val folded = TextOps.foldChatLines(lines)
      .orderBy(col("msg_no")).collect().map(_.getAs[String]("message"))
    folded shouldBe Array("first continuation of first", "second")
  }

  test("logistic quality score matches the hand-computed sigmoid") {
    // "the cat sat." → 3 tokens, 1 stopword; 1 punct char over 12 chars.
    val text = "the cat sat."
    val lenN = math.min(text.length / 500.0, 1.0)
    val z = -1.0 + 3.0 * lenN - 8.0 * (1.0 / 12.0) + 5.0 * (1.0 / 3.0)
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tmp = java.nio.file.Files.createTempDirectory("logit").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(java.util.Arrays.asList(
        Row(1L, text, "en", "src0", text.length.toLong)), schema)
      .write.parquet(tmp + "/documents.parquet")
    val r = TextOps.qualityLogistic(spark, tmp).head()
    r.getAs[Double]("ml_score") shouldBe expected +- 1e-9
  }

  test("oov rate: the vocab cut is count-then-token deterministic, fractions hand-checked") {
    // 30 distinct tokens; t01 count 3, t02..t25 count 2, t26 count 2,
    // t27..t30 count 1. The rank-25 cut falls INSIDE the count-2 tie group
    // — the token-asc tiebreak puts t02..t25 in, t26 out.
    val a = ((1 to 25).map(i => f"t$i%02d") ++ (1 to 25).map(i => f"t$i%02d")).mkString(" ")
    val b = "t26 t27 t28 t29 t30"
    val c = "t01 t26"
    val tmp = java.nio.file.Files.createTempDirectory("oov").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(java.util.Arrays.asList(
        Row(1L, a, "en", "src0", a.length.toLong),
        Row(2L, b, "en", "src0", b.length.toLong),
        Row(3L, c, "en", "src0", c.length.toLong)), schema)
      .write.parquet(tmp + "/documents.parquet")
    val out = TextOps.oovRate(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out(1L) shouldBe ((50L, 0L, 0.0))  // all in vocab
    out(2L) shouldBe ((5L, 5L, 1.0))   // t26 loses the tie, t27..t30 below cut
    out(3L) shouldBe ((2L, 1L, 0.5))
  }
}
