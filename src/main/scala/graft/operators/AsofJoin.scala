package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left event, the most recent right event
  * at-or-before its timestamp, per key (SURVEY.md §2.3 J5 — deferred there,
  * closed here).
  *
  * Spark has no native as-of join; the idiomatic composition is
  * union-and-carry-forward: tag both sides, union, and per key carry the
  * latest right-side payload forward with `last(_, ignoreNulls)` over a
  * time-ordered rows frame. One shuffle on the key + one local sort — the
  * same cost envelope as a sort-merge join (no per-row probe, no range
  * explosion), which is why this shape survives 100 TB; AQE splits skewed
  * keys. Right rows sort before left rows at equal timestamps (side 0 < 1)
  * so "at-or-before" includes exact ties; right-side ties resolve to the
  * highest event id.
  */
object AsofJoin {

  /** For each event of `leftType`, attach the id and timestamp of the
    * user's latest `rightType` event at-or-before it. */
  def lastEventBefore(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("ts").as("t"), lit(1).as("side"),
        col("event_id"), lit(null).cast("long").as("r_id"),
        lit(null).cast("timestamp").as("r_ts"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id"), col("ts").as("t"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("side"), coalesce(col("r_id"), col("event_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("asof_id"),
        when(col("asof_ts").isNull, lit(null).cast("long"))
          .otherwise(floor((unix_micros(col("t")) - unix_micros(col("asof_ts"))) / 1000000L)
            .cast("long")).as("secs_since"))
  }

  /** Q-asof-join: each purchase joined to the user's most recent prior (or
    * simultaneous) click. */
  def asofClickPurchase(spark: SparkSession, dir: String): DataFrame =
    lastEventBefore(Tables.events(spark, dir), "purchase", "click")
      .orderBy(col("event_id"))

  val asofClickPurchaseSql: String =
    """WITH u AS (
      |  SELECT user_id, ts AS t, 1 AS side, event_id,
      |         CAST(NULL AS BIGINT) AS r_id, CAST(NULL AS TIMESTAMP) AS r_ts
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts AS t, 0 AS side, CAST(NULL AS BIGINT) AS event_id,
      |         event_id AS r_id, CAST(ts AS TIMESTAMP) AS r_ts
      |  FROM events WHERE event_type = 'click'),
      |c AS (
      |  SELECT *,
      |    last_value(r_id IGNORE NULLS) OVER w AS asof_id,
      |    last_value(r_ts IGNORE NULLS) OVER w AS asof_ts
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY t, side, coalesce(r_id, event_id)
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, asof_id,
      |  CASE WHEN asof_ts IS NULL THEN CAST(NULL AS BIGINT)
      |       ELSE (epoch_us(t) - epoch_us(asof_ts)) // 1000000 END AS secs_since
      |FROM c WHERE side = 1 ORDER BY event_id""".stripMargin

  /** Q-asof-tolerance: the bounded-staleness variant — a match older than
    * `toleranceSecs` is discarded (NULLed), the semantics every
    * market-data / feature-store as-of join actually wants (an hours-old
    * click is not "the click before this purchase"). Same single
    * union-and-carry-forward pass; the tolerance is one post-window
    * predicate, costing nothing extra at any scale. */
  def asofWithTolerance(spark: SparkSession, dir: String): DataFrame = {
    val toleranceSecs = 600L
    lastEventBefore(Tables.events(spark, dir), "purchase", "click")
      .withColumn("asof_id",
        when(col("secs_since") <= toleranceSecs, col("asof_id"))
          .otherwise(lit(null).cast("long")))
      .withColumn("secs_since",
        when(col("asof_id").isNotNull, col("secs_since"))
          .otherwise(lit(null).cast("long")))
      .orderBy(col("event_id"))
  }

  val asofWithToleranceSql: String =
    s"""WITH base AS ($asofClickPurchaseSql)
       |SELECT event_id, user_id,
       |  CASE WHEN secs_since <= 600 THEN asof_id ELSE CAST(NULL AS BIGINT) END AS asof_id,
       |  CASE WHEN secs_since <= 600 THEN secs_since ELSE CAST(NULL AS BIGINT) END AS secs_since
       |FROM base ORDER BY event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (asofClickPurchase _),
    "q_asof_tolerance" -> (asofWithTolerance _))

  def oracles: Map[String, String] = Map(
    "q_asof_join" -> asofClickPurchaseSql,
    "q_asof_tolerance" -> asofWithToleranceSql)
}
