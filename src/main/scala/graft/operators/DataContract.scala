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
  * Scale shape: a table's scalar checks (predicate counts) share ONE
  * aggregation over one scan — map-side partial sums, unpivoted into
  * check rows afterwards — so each fact table is read once for them;
  * uniqueness is one count + one count-distinct over the key only (the
  * key column is the only thing shuffled); referential integrity is a
  * LEFT ANTI join with NO broadcast hint — the planner broadcasts the
  * parent-key column while it fits `autoBroadcastJoinThreshold` and
  * degrades to the standard shuffled anti-join beyond it (an
  * unconditional hint would instead force a driver collect of a 100 TB
  * parent). Null semantics are the anti-join's on BOTH engines: a NULL
  * foreign key never matches its parent and therefore COUNTS as an
  * orphan (the oracle states NOT EXISTS, not NOT IN, whose
  * three-valued-logic silently drops null keys — and reports zero
  * orphans entirely if the parent side contains one NULL key).
  */
object DataContract {

  private val CheckSchema = Seq("check_name", "n_violations", "n_checked")

  /** One scalar-checks pass over a single table: every (name, violation
    * predicate count) pair computes in the SAME aggregate, then unpivots
    * map-side into one row per check. */
  private def scalarChecks(table: DataFrame,
                           checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case ((_, v), i) =>
      v.cast("long").as(s"v$i")
    } :+ count(lit(1)).as("n")
    val rows = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"), col(s"v$i").as("n_violations"),
        col("n").as("n_checked"))
    }
    table.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("c"))
      .select(CheckSchema.map(f => col(s"c.$f")): _*)
  }

  /** Orphan-count check: child rows whose `fk` matches no parent `pk`.
    * `n_checked` restates the orphan count — the contract is on the child
    * table, and a second full child scan just to report its cardinality
    * would double the cost of the cheapest check in the suite. */
  private def refintCheck(name: String, child: DataFrame, fk: String,
                          parent: DataFrame, pk: String): DataFrame =
    child.join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"),
        col("n_violations").cast("long").as("n_violations"),
        col("n_violations").cast("long").as("n_checked"))

  /** Q-data-contract: the full suite over the snapshot's five core
    * tables, one row per check, total order by check name. */
  def dataContract(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)
    val documents = Tables.documents(spark, dir)

    val checks = Seq(
      // documents: completeness + language domain, ONE scan. The lang set
      // deliberately OMITS zh (75 docs at sf0.01), so the suite
      // demonstrably reports violations — a contract checker whose every
      // check passes on its own test data proves only the happy path
      scalarChecks(documents, Seq(
        "documents_text_complete" ->
          sum(when(col("text").isNull, 1L).otherwise(0L)),
        "documents_lang_domain" ->
          sum(when(col("lang").isin("en", "es", "de", "fr", "pt"), 0L)
            .otherwise(1L)))),
      // uniqueness: primary-key duplication on the orders fact
      scalarChecks(orders, Seq(
        "orders_orderkey_unique" ->
          (count(lit(1)) - count_distinct(col("o_orderkey"))))),
      // referential integrity (see class doc for the null contract)
      refintCheck("orders_custkey_refint", orders, "o_custkey",
        customer, "c_custkey"),
      refintCheck("lineitem_orderkey_refint", lineitem, "l_orderkey",
        orders, "o_orderkey"),
      // domain range: TPC-H quantities live in [1, 50]
      scalarChecks(lineitem, Seq(
        "lineitem_quantity_range" ->
          sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
            .otherwise(0L)))),
      // domain range: negative event values are instrumentation bugs
      scalarChecks(events, Seq(
        "events_value_nonneg" ->
          sum(when(col("value") < 0.0, 1L).otherwise(0L)))))

    checks.reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }

  val dataContractSql: String =
    """SELECT check_name, n_violations, n_checked, n_violations = 0 AS pass
      |FROM (
      |  SELECT 'documents_text_complete' AS check_name,
      |    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |    COUNT(*) AS n_checked FROM documents
      |  UNION ALL
      |  SELECT 'documents_lang_domain',
      |    CAST(SUM(CASE WHEN lang IN ('en','es','de','fr','pt') THEN 0 ELSE 1 END) AS BIGINT),
      |    COUNT(*) FROM documents
      |  UNION ALL
      |  SELECT 'orders_orderkey_unique',
      |    COUNT(*) - COUNT(DISTINCT o_orderkey), COUNT(*) FROM orders
      |  UNION ALL
      |  SELECT 'orders_custkey_refint', COUNT(*), COUNT(*)
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_refint', COUNT(*), COUNT(*)
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'lineitem_quantity_range',
      |    CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(*) FROM lineitem
      |  UNION ALL
      |  SELECT 'events_value_nonneg',
      |    CAST(SUM(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(*) FROM events
      |) u ORDER BY check_name""".stripMargin

  /** Q-table-stats: the ANALYZE-style per-column statistics profile — the
    * artifact a cost-based optimizer (or a human sizing partitions)
    * consumes: per column, row count, null count, EXACT distinct count,
    * and a numeric min/max (string columns profile their LENGTH — the
    * payload-sizing signal; timestamps profile whole epoch seconds so
    * both engines state integer arithmetic). q_data_contract answers
    * "does the snapshot violate its contract"; this answers "what does
    * the snapshot look like" — the scan that runs BEFORE choosing
    * shuffle partition counts, join strategies, and bucketing keys.
    *
    * Scale shape: one aggregation over one scan of the table computes
    * every column's stats (the multi-distinct rewrite plans one Expand —
    * rows × #distinct-aggs — with map-side partial aggregation; the
    * alternative, one pass per column, scans the table #columns times),
    * then the single result row unpivots map-side into one row per
    * column. At 100 TB this is the same shape ANALYZE TABLE runs. */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("value"),
      floor(col("ts").cast("double")).as("ts_sec"),
      length(col("event_type")).cast("long").as("type_len"),
      length(col("props")).cast("long").as("props_len"))
    val cols = Seq("event_id", "user_id", "value", "ts_sec",
      "type_len", "props_len")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        round(col(s"min_$c"), 6).as("min_v"),
        round(col(s"max_$c"), 6).as("max_v"))
    }
    ev.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("s"))
      .select(col("s.column"), col("s.n_rows"), col("s.n_nulls"),
        col("s.n_distinct"), col("s.min_v"), col("s.max_v"))
      .orderBy(col("column"))
  }

  val tableStatsSql: String = {
    def one(name: String, expr: String): String =
      s"""SELECT '$name' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($expr) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $expr) AS BIGINT) AS n_distinct,
         |  ROUND(CAST(MIN($expr) AS DOUBLE), 6) AS min_v,
         |  ROUND(CAST(MAX($expr) AS DOUBLE), 6) AS max_v
         |FROM events""".stripMargin
    Seq(
      one("event_id", "event_id"),
      one("user_id", "user_id"),
      one("value", "value"),
      one("ts_sec", "FLOOR(epoch(ts))"),
      one("type_len", "length(event_type)"),
      one("props_len", "length(props)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** The candidate FDs q_fd_discovery profiles — key→attr (holds by
    * construction), attr→attr both directions (data decides). */
  private val FdCandidates: Seq[(String, String, String)] = Seq(
    ("documents", "source", "lang"),
    ("documents", "lang", "source"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"))

  /** Q-fd-discovery: FUNCTIONAL-DEPENDENCY PROFILING — the discovery
    * sibling of [[dataContract]]'s declared checks and [[tableStats]]'s
    * column profile: for each candidate determinant→dependent pair,
    * measure how close the data comes to satisfying the FD (how many
    * determinant groups map to more than one dependent value, the worst
    * fan-out, and the g3-style strength 1 − violating/groups). This is
    * what tells a pipeline which "looks like a key / looks derived"
    * assumptions actually hold before they get baked into joins or
    * dedup scoping — a key FD reads strength 1.0, an independent pair
    * reads near 0.
    *
    * Scale shape: each candidate pair is one (determinant-keyed)
    * count-distinct aggregation — the determinant column is the only
    * thing shuffled — and the per-pair summaries are one row each. The
    * candidate list is metadata (real FD miners enumerate lattices; the
    * operator's unit cost per candidate is what matters at scale). */
  def fdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    def table(name: String): DataFrame = name match {
      case "documents" => Tables.documents(spark, dir)
      case "orders" => Tables.orders(spark, dir)
    }
    FdCandidates.map { case (t, det, dep) =>
      table(t)
        .groupBy(col(det))
        .agg(countDistinct(col(dep)).as("nd"))
        .agg(count(lit(1)).as("n_groups"),
          coalesce(sum(when(col("nd") > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_violating"),
          max(col("nd")).as("max_fanout"))
        .select(lit(t).as("table_name"), lit(det).as("determinant"),
          lit(dep).as("dependent"), col("n_groups"), col("n_violating"),
          col("max_fanout"),
          round(lit(1.0) - col("n_violating").cast("double") / col("n_groups"), 6)
            .as("fd_strength"))
    }.reduce(_ unionByName _)
      .orderBy(col("table_name"), col("determinant"), col("dependent"))
  }

  val fdDiscoverySql: String = {
    def one(t: String, det: String, dep: String) =
      s"""SELECT '$t' AS table_name, '$det' AS determinant, '$dep' AS dependent,
         |  CAST(COUNT(*) AS BIGINT) AS n_groups,
         |  CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN 1 END), 0) AS BIGINT) AS n_violating,
         |  MAX(nd) AS max_fanout,
         |  ROUND(1.0 - CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN 1 END), 0) AS DOUBLE)
         |        / COUNT(*), 6) AS fd_strength
         |FROM (SELECT $det, COUNT(DISTINCT $dep) AS nd FROM $t GROUP BY $det)""".stripMargin
    FdCandidates.map { case (t, det, dep) => one(t, det, dep) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, determinant, dependent")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_data_contract" -> (dataContract _),
    "q_fd_discovery" -> (fdDiscovery _),
    "q_table_stats" -> (tableStats _))

  def oracles: Map[String, String] = Map(
    "q_data_contract" -> dataContractSql,
    "q_fd_discovery" -> fdDiscoverySql,
    "q_table_stats" -> tableStatsSql)
}
