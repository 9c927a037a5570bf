package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval/range join via time binning (SURVEY.md §2.3 J5's second half).
  *
  * A naive range join (`ON abs(a.ts − b.ts) <= w`) plans as a broadcast
  * nested loop — quadratic work that dies at scale. Binning makes it an
  * EQUI-join: bucket both sides into width-w bins, probe each left row
  * against its bin ±1 (any row within w is in one of those three bins),
  * then apply the exact predicate. The shuffle key is (user, bin) — the
  * same hash-partitioned join every other operator uses, and AQE handles
  * per-bin skew. A right row joins at most once per left row (its single
  * bin can match only one of the three distinct probe bins).
  */
object RangeJoin {

  /** For each left event, count right-type events of the same user within
    * ±`windowSecs`. Left events with no match count 0. */
  def countWithin(events: DataFrame, leftType: String, rightType: String,
                  windowSecs: Long): DataFrame = {
    val binUs = windowSecs * 1000000L
    val left = events.filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
      .withColumn("bin", floor(col("t_us") / binUs))
    val right = events.filter(col("event_type") === rightType)
      .select(col("user_id"), unix_micros(col("ts")).as("r_us"))
      .withColumn("r_bin", floor(col("r_us") / binUs))
    val matched = left
      .withColumn("probe_bin", explode(array(col("bin") - 1, col("bin"), col("bin") + 1)))
      .join(right,
        left("user_id") === right("user_id") && col("probe_bin") === col("r_bin"))
      .filter(abs(col("t_us") - col("r_us")) <= binUs)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
    left.select(col("event_id"), col("user_id"))
      .join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_close"))
      .orderBy(col("event_id"))
  }

  def rangeJoinQuery(spark: SparkSession, dir: String): DataFrame =
    countWithin(Tables.events(spark, dir), "purchase", "click", 600L)

  val rangeJoinSql: String =
    """SELECT p.event_id, p.user_id, COUNT(c.event_id) AS n_close
      |FROM events p LEFT JOIN events c
      |  ON c.event_type = 'click' AND c.user_id = p.user_id
      | AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 600 * 1000000
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> (rangeJoinQuery _))

  def oracles: Map[String, String] = Map(
    "q_range_join" -> rangeJoinSql)
}
