package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the HLL incremental-distinct MV (q_incr_distinct — rows-only
  * at the driver, so the correctness contract lives here): estimates
  * inside the HLL error envelope of exact counts, and the
  * MV-merge-with-delta path row-identical to a from-scratch rebuild.
  */
class IncrDistinctSpec extends SparkSpecBase with Matchers {

  test("estimates within the HLL envelope of exact counts; TOTAL is the union, not a sum") {
    val rows = EventOps.incrDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactTotal = Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).head().getLong(0)

    exact.foreach { case (day, nd) =>
      val est = rows(day)
      withClue(s"day $day est $est vs exact $nd:") {
        math.abs(est - nd).toDouble should be <= math.max(2.0, 0.05 * nd)
      }
    }
    val totalEst = rows("TOTAL")
    math.abs(totalEst - exactTotal).toDouble should be <= math.max(2.0, 0.05 * exactTotal)
    // the sketch union deduplicates users active on several days: the
    // TOTAL must sit well below the per-day sum whenever overlap exists
    val daySum = exact.values.sum
    if (exactTotal < daySum) totalEst.toDouble should be < daySum.toDouble
  }

  test("incremental merge equals a from-scratch rebuild row for row") {
    val incr = EventOps.incrDistinct(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // rebuild: every day's sketch computed fresh in one pass (no MV)
    val ev = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    val all = ev.groupBy(col("day")).agg(hll_sketch_agg(col("user_id")).as("sk"))
    val daily = all.select(col("day"), hll_sketch_estimate(col("sk")).as("n"))
    val total = all.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .select(lit("TOTAL").as("day"), col("n"))
    val rebuild = daily.unionByName(total).orderBy(col("day")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    incr shouldBe rebuild
  }
}
