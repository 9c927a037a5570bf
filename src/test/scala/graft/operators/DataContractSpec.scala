package graft.operators

import graft.{SparkSpecBase, Tables}
import org.scalatest.matchers.should.Matchers

/** Referee gates for the validation/profiling suite (value parity is
  * oracle-gated; these recompute the semantics independently). */
class DataContractSpec extends SparkSpecBase with Matchers {

  test("table stats profile matches per-column stats recomputed in plain Scala") {
    val out = DataContract.tableStats(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    out.keySet shouldBe Set("event_id", "user_id", "value", "ts_sec",
      "type_len", "props_len")

    val rows = Tables.events(spark, sfDir).collect()
    val n = rows.length.toLong
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def referee(vals: Seq[Option[Double]]): (Long, Long, Long, Double, Double) = {
      val present = vals.flatten
      (n, (vals.size - present.size).toLong, present.distinct.size.toLong,
        r6(present.min), r6(present.max))
    }
    val byCol = Map(
      "event_id" -> rows.map(r => Option(r.getLong(0).toDouble)).toSeq,
      "user_id" -> rows.map(r => Option(r.getLong(2).toDouble)).toSeq,
      "value" -> rows.map(r => Option(r.getDouble(4))).toSeq,
      "ts_sec" -> rows.map(r => Option(
        math.floor(r.getTimestamp(1).getTime / 1000.0))).toSeq,
      "type_len" -> rows.map(r => Option(r.getString(3).length.toDouble)).toSeq,
      "props_len" -> rows.map(r =>
        Option(r.getString(5)).map(_.length.toDouble)).toSeq)
    byCol.foreach { case (c, vals) =>
      withClue(s"column $c: ") { out(c) shouldBe referee(vals) }
    }
    // every profiled column is fully populated in this corpus except
    // possibly props; n_rows is constant across rows of the profile
    out.values.map(_._1).toSet shouldBe Set(n)
  }
}
