package graft.streaming

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Structural gates for q_stream_window (value parity is oracle-gated):
  * the sentinel flush pattern must surface EVERY real window — the
  * classic append-mode failure is a silently missing final window — and
  * must never leak the sentinel itself. */
class StreamWindowSpec extends SparkSpecBase with Matchers {

  test("streaming windows equal the batch windows, sentinel excluded") {
    val stream = EventsStream.streamWindowCounts(spark, sfDir).collect()
    val batch = graft.operators.EventOps.windowEvents(spark, sfDir).collect()
    // same window set and counts (batch q_window_events is oracle-green)
    stream.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq shouldBe
      batch.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // no __flush rows escaped
    stream.map(_.getString(1)) should not contain "__flush"
    // decimal-summed values agree with the batch double sums to the
    // 3-decimal rounding the contract states
    stream.map(_.getDouble(3)).zip(batch.map(_.getDouble(3))).foreach {
      case (s, b) => s shouldBe b +- 0.002
    }
  }

  test("stream-stream interval join emits exactly the batch interval join's pairs") {
    import org.apache.spark.sql.functions._
    val stream = EventsStream.streamIntervalJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent batch recomputation of the same interval predicate
    val ev = graft.Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val batch = p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("p_user"), col("c_id"))
      .orderBy(col("p_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    stream.toSeq shouldBe batch.toSeq
    assert(batch.nonEmpty, "corpus plants purchase-after-click pairs; empty means the replay is broken")
  }
}
