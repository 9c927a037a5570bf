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
}
