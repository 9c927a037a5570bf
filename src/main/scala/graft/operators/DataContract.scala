package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the constraint suite a training
  * pipeline runs over every ingested snapshot BEFORE the data reaches
  * dedup/gating/packing (the Deequ/Great-Expectations capability,
  * re-expressed as plain Catalyst aggregations): completeness (null
  * rate), uniqueness (key duplication), referential integrity (orphan
  * foreign keys), and domain ranges. A violated contract fails the
  * snapshot, not the job — so the output is one row PER CHECK with its
  * violation count, never an exception.
  *
  * Scale shape: every check is a single scan-side aggregate (predicate
  * counts compile to map-side partial sums), uniqueness is one count +
  * one count-distinct over the key only (the key column is the only
  * thing shuffled), and referential integrity is a LEFT ANTI join that
  * broadcasts the (distinct) parent keys when small and degrades to the
  * standard shuffled anti-join when not. Checks are independent 1-row
  * frames; the union is presentation-only. At 100 TB this entire suite
  * is one pass per fact table plus the key-only shuffles.
  */
object DataContract {

  private def check(name: String, violations: Column, checked: Column,
                    from: DataFrame): DataFrame =
    from.agg(
      violations.cast("long").as("n_violations"),
      checked.cast("long").as("n_checked"))
      .select(lit(name).as("check_name"), col("n_violations"),
        col("n_checked"),
        (col("n_violations") === 0L).as("pass"))

  /** Q-data-contract: the full suite over the snapshot's five core
    * tables, one row per check, total order by check name. */
  def dataContract(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)
    val documents = Tables.documents(spark, dir)

    val checks = Seq(
      // completeness: a document with no text is unusable downstream
      check("documents_text_complete",
        sum(when(col("text").isNull, 1L).otherwise(0L)),
        count(lit(1)), documents),
      // uniqueness: primary-key duplication on the orders fact
      check("orders_orderkey_unique",
        count(lit(1)) - count_distinct(col("o_orderkey")),
        count(lit(1)), orders),
      // referential integrity: orders must point at existing customers
      check("orders_custkey_refint",
        count(lit(1)), count(lit(1)),
        orders.join(broadcast(customer.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")),
      // referential integrity: lineitems must point at existing orders
      check("lineitem_orderkey_refint",
        count(lit(1)), count(lit(1)),
        lineitem.join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")),
      // domain range: TPC-H quantities live in [1, 50]
      check("lineitem_quantity_range",
        sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
          .otherwise(0L)),
        count(lit(1)), lineitem),
      // domain range: negative event values are instrumentation bugs
      check("events_value_nonneg",
        sum(when(col("value") < 0.0, 1L).otherwise(0L)),
        count(lit(1)), events),
      // domain set: language tags must come from the declared set. The
      // set deliberately OMITS zh (75 docs at sf0.01), so the suite
      // demonstrably reports violations — a contract checker whose every
      // check passes on its own test data proves only the happy path
      check("documents_lang_domain",
        sum(when(col("lang").isin("en", "es", "de", "fr", "pt"), 0L)
          .otherwise(1L)),
        count(lit(1)), documents))

    checks.reduce(_.unionByName(_)).orderBy(col("check_name"))
  }

  /** `n_checked` for the referential checks counts the ORPHAN rows (the
    * anti-join output), same as n_violations — the contract is on the
    * child table, and restating the violation count keeps the check
    * self-describing without a second scan of the child. */
  val dataContractSql: String =
    """SELECT check_name, n_violations, n_checked, n_violations = 0 AS pass
      |FROM (
      |  SELECT 'documents_text_complete' AS check_name,
      |    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |    COUNT(*) AS n_checked FROM documents
      |  UNION ALL
      |  SELECT 'orders_orderkey_unique',
      |    COUNT(*) - COUNT(DISTINCT o_orderkey), COUNT(*) FROM orders
      |  UNION ALL
      |  SELECT 'orders_custkey_refint', COUNT(*), COUNT(*)
      |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_refint', COUNT(*), COUNT(*)
      |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |  UNION ALL
      |  SELECT 'lineitem_quantity_range',
      |    CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(*) FROM lineitem
      |  UNION ALL
      |  SELECT 'events_value_nonneg',
      |    CAST(SUM(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(*) FROM events
      |  UNION ALL
      |  SELECT 'documents_lang_domain',
      |    CAST(SUM(CASE WHEN lang IN ('en','es','de','fr','pt') THEN 0 ELSE 1 END) AS BIGINT),
      |    COUNT(*) FROM documents
      |) u ORDER BY check_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_data_contract" -> (dataContract _))

  def oracles: Map[String, String] = Map(
    "q_data_contract" -> dataContractSql)
}
