package graft.sources

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The schema-adaptive events reader (Tables.events) must keep EVERY
  * physical form working — the round-8 testdata refresh changed
  * `events.ts` from TIMESTAMP(NANOS) (surfaced as raw longs by the
  * nanosAsLong conf) to timestamp[us] without timezone (TIMESTAMP_NTZ)
  * under the code, and a reader pinned to either form breaks when the
  * other ships. Current testdata exercises the NTZ branch through every
  * events query; this spec keeps the legacy long branch (and the LTZ
  * pass-through) from silently rotting, and pins branch equivalence:
  * the SAME instants through any physical form must read identically. */
class EventsReaderSpec extends SparkSpecBase with Matchers {

  test("nanos-long, NTZ, and LTZ events files all read to the same instants") {
    import spark.implicits._
    // three instants with full microsecond precision
    val micros = Seq(1700000000000000L, 1700000123456789L, 1700009999999999L)
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")

    def writeVariant(ts: org.apache.spark.sql.Column): String = {
      // under the self-deleting scratch root — specs must not leak /tmp
      val dir = graft.Scratch.dir("ev")
      base.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(dir + "/events.parquet")
      dir
    }
    val longDir = writeVariant((col("us") * 1000L).as("ts")) // raw nanos longs
    val ntzDir = writeVariant(timestamp_micros(col("us")).cast("timestamp_ntz"))
    val ltzDir = writeVariant(timestamp_micros(col("us")))

    def readUs(dir: String): Seq[Long] = {
      val df: DataFrame = Tables.events(spark, dir)
      // every branch must land on TIMESTAMP_LTZ (what all operators expect)
      df.schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
      df.orderBy("event_id").select(unix_micros(col("ts")))
        .collect().map(_.getLong(0)).toSeq
    }
    readUs(longDir) shouldBe micros
    readUs(ntzDir) shouldBe micros
    readUs(ltzDir) shouldBe micros

    // branch equivalence must NOT depend on the session timezone: a
    // session-zone cast of the NTZ form would shift every instant by the
    // zone offset while the other branches stayed on true epoch micros
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      readUs(longDir) shouldBe micros
      readUs(ntzDir) shouldBe micros
      readUs(ltzDir) shouldBe micros
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }
}
