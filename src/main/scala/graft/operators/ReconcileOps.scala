package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-reconciliation operators: blocked fuzzy entity matching and
  * snapshot diffing. The reference's only identity notion is the
  * synthesized `vector_id_<lineNumber>` (`upsert/upsert.go:170`), which
  * makes re-runs silently overwrite and gives no way to reconcile two
  * ingests of the same corpus; these are the operators a production
  * pipeline runs instead — match records that ALMOST agree (entity
  * resolution) and classify exactly what changed between two loads
  * (snapshot diff).
  *
  * Scale shapes: fuzzy matching never goes quadratic — candidates come
  * from a blocking-key equi-join over the (dedup'd, much smaller)
  * distinct-name frame, and the expensive edit-distance kernel runs only
  * inside blocks; the diff is one full-outer hash join on the key with
  * map-side snapshot derivation on both inputs.
  */
object ReconcileOps {

  /** Edit-distance threshold for a candidate match. */
  val FuzzyMaxDist = 2

  /** Q-fuzzy-join: blocked fuzzy entity matching over part names. Names
    * are first DEDUP'D to the distinct-name frame (with part counts, so
    * nothing is lost), then candidate pairs come from an equi-join on a
    * BLOCKING KEY (the name's last word — the entity's "type" token) and
    * only in-block pairs pay the Levenshtein kernel, `dist <= 2` keeps a
    * match. This is standard record-linkage blocking: at 100 TB the
    * distinct-name frame is orders of magnitude smaller than the records
    * table, the block join is a plain hash join (no cross product — plan
    * asserted in ReconcileOpsSpec), and per-block fanout is bounded by
    * block cardinality, the knob blocking exists to control.
    *
    * Both engines ship the same classic Levenshtein (unit-cost edits), so
    * the oracle runs the identical predicate. */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("block", regexp_extract(col("p_name"), "(\\S+)$", 1))
    val a = names.select(col("p_name").as("name_a"), col("n_parts").as("cnt_a"), col("block"))
    val b = names.select(col("p_name").as("name_b"), col("n_parts").as("cnt_b"), col("block"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= FuzzyMaxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("cnt_a"), col("cnt_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  val fuzzyJoinSql: String =
    s"""WITH names AS (
       |  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
       |         regexp_extract(p_name, '(\\S+)$$', 1) AS block
       |  FROM part GROUP BY p_name)
       |SELECT a.p_name AS name_a, b.p_name AS name_b,
       |  levenshtein(a.p_name, b.p_name) AS dist,
       |  a.n_parts AS cnt_a, b.n_parts AS cnt_b
       |FROM names a JOIN names b USING (block)
       |WHERE a.p_name < b.p_name
       |  AND levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
       |ORDER BY name_a, name_b""".stripMargin

  /** Q-table-diff: snapshot diff — classify every key as added / removed
    * / changed / unchanged between two loads of the events table. The two
    * snapshots are derived deterministically from the one shipped table
    * (an "old" load missing `id % 11 = 3`, with `id % 7 = 0` values
    * drifted by +1.0; a "new" load missing `id % 13 = 5`), so the oracle
    * states the identical arithmetic. Presence is tracked with explicit
    * marker columns — NOT null-ness of payload columns, which conflates
    * "row absent" with "column null" — and value comparison is null-safe
    * (`<=>`). One full-outer hash join on the key; at 100 TB the wide
    * payload compare becomes a per-side row-hash compare (xxhash64 of the
    * payload struct, computed map-side), with this exact classification
    * logic unchanged. */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val old = ev.filter(col("event_id") % 11 =!= 3)
      .select(col("event_id"),
        col("event_type").as("type_old"),
        when(col("event_id") % 7 === 0, col("value") + 1.0)
          .otherwise(col("value")).as("value_old"),
        lit(1).as("in_old"))
    val neu = ev.filter(col("event_id") % 13 =!= 5)
      .select(col("event_id"),
        col("event_type").as("type_new"),
        col("value").as("value_new"),
        lit(1).as("in_new"))
    old.join(neu, Seq("event_id"), "full_outer")
      .withColumn("change_class",
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(!(col("value_old") <=> col("value_new")) ||
            !(col("type_old") <=> col("type_new")), "changed")
          .otherwise("unchanged"))
      .groupBy(col("change_class"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("change_class"))
  }

  val tableDiffSql: String =
    """WITH old AS (
      |  SELECT event_id, event_type AS type_old,
      |    CASE WHEN event_id % 7 = 0 THEN value + 1.0 ELSE value END AS value_old,
      |    1 AS in_old
      |  FROM events WHERE event_id % 11 != 3),
      |neu AS (
      |  SELECT event_id, event_type AS type_new, value AS value_new, 1 AS in_new
      |  FROM events WHERE event_id % 13 != 5),
      |j AS (
      |  SELECT COALESCE(old.event_id, neu.event_id) AS event_id,
      |    CASE WHEN in_old IS NULL THEN 'added'
      |         WHEN in_new IS NULL THEN 'removed'
      |         WHEN value_old IS DISTINCT FROM value_new
      |           OR type_old IS DISTINCT FROM type_new THEN 'changed'
      |         ELSE 'unchanged' END AS change_class
      |  FROM old FULL OUTER JOIN neu ON old.event_id = neu.event_id)
      |SELECT change_class, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM j GROUP BY change_class ORDER BY change_class""".stripMargin

  /** Q-scd2: type-2 slowly-changing-dimension merge — the history-keeping
    * counterpart of [[graft.operators.Upsert.lastWriteWins]]. The
    * reference's upsert silently OVERWRITES prior versions
    * (`upsert/upsert.go:170` — same id, last write wins); SCD2 is what a
    * production dimension load does instead: close the old version row
    * (valid_to set, no longer current) and open a new one, so every past
    * state stays queryable as-of any date.
    *
    * Two loads are derived deterministically from the shipped customer
    * table so the oracle states the identical arithmetic: the 1995-01-01
    * base load is the table itself; the 1996-01-01 snapshot moves
    * `% 7 = 0` keys to segment MOVED, drifts `% 11 = 4` balances by +50,
    * drops `% 13 = 6` keys (churn → close-out), and adds `% 97 = 0` keys
    * re-keyed past the key domain (+max(c_custkey), insert path). The
    * merge classifies every key via
    * ONE full-outer hash join on the key with explicit presence markers
    * (the [[tableDiff]] discipline — null payloads don't conflate with
    * absent rows), then emits history rows from two map-side projections
    * of that single joined frame: the old-version row (closed iff changed
    * or removed) and the new-version row (opened iff changed or added).
    *
    * Scale shape: one key shuffle for the join, map-side everything else.
    * At 100 TB the dimension is bucketed by key so the nightly merge is a
    * co-located join, and only partitions containing touched keys rewrite
    * (the IndexCatalog.upsertInto partition-scoped-rewrite discipline). */
  def scd2(spark: SparkSession, dir: String): DataFrame =
    scd2History(spark, dir).orderBy(col("custkey"), col("valid_from"))

  /** The un-ordered SCD2 history frame — shared by the declared merge
    * query ([[scd2]]) and its point-in-time consumer ([[asofDim]]). */
  private def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val base = cust.select(
      col("c_custkey").as("custkey"),
      col("c_mktsegment").as("seg_old"),
      col("c_acctbal").as("bal_old"),
      lit(1).as("in_old"))
    // insert-path re-key offset = MAX existing key + 1, so new keys can
    // never collide with real ones at ANY scale factor (a fixed constant
    // like +1000000 collides once the key domain outgrows it — TPC-H
    // custkeys reach SF*150000 — and a bare MAX collides with itself for
    // key 0, since the testdata keys are 0-based: 0 + max == max);
    // distinct sources keep the re-keyed ids distinct
    val maxKey = cust.agg((max(col("c_custkey")) + 1L).as("mk"))
    val snap = cust.filter(col("c_custkey") % 13 =!= 6)
      .select(
        col("c_custkey").as("custkey"),
        when(col("c_custkey") % 7 === 0, lit("MOVED"))
          .otherwise(col("c_mktsegment")).as("seg_new"),
        when(col("c_custkey") % 11 === 4, col("c_acctbal") + 50.0)
          .otherwise(col("c_acctbal")).as("bal_new"))
      .unionByName(cust.filter(col("c_custkey") % 97 === 0)
        .crossJoin(broadcast(maxKey))
        .select(
          (col("c_custkey") + col("mk")).as("custkey"),
          lit("NEW").as("seg_new"),
          lit(0.0).as("bal_new")))
      .withColumn("in_new", lit(1))
    val j = base.join(snap, Seq("custkey"), "full_outer")
      .withColumn("changed",
        col("in_old").isNotNull && col("in_new").isNotNull &&
          (!(col("seg_old") <=> col("seg_new")) ||
            !(col("bal_old") <=> col("bal_new"))))
    val t0 = to_date(lit("1995-01-01"))
    val t1 = to_date(lit("1996-01-01"))
    val nullDate = lit(null).cast("date")
    val oldRows = j.filter(col("in_old").isNotNull).select(
      col("custkey"),
      col("seg_old").as("segment"),
      col("bal_old").as("acctbal"),
      t0.as("valid_from"),
      when(col("changed") || col("in_new").isNull, t1)
        .otherwise(nullDate).as("valid_to"),
      when(col("changed") || col("in_new").isNull, 0)
        .otherwise(1).as("is_current"))
    val newRows = j.filter(col("in_new").isNotNull &&
        (col("changed") || col("in_old").isNull)).select(
      col("custkey"),
      col("seg_new").as("segment"),
      col("bal_new").as("acctbal"),
      t1.as("valid_from"),
      nullDate.as("valid_to"),
      lit(1).as("is_current"))
    oldRows.unionByName(newRows)
  }

  /** The SCD2 history as a reusable oracle CTE chain ending in `hist` —
    * shared by the merge query's oracle and the point-in-time join's. */
  private val scd2HistoryCte: String =
    """base AS (
      |  SELECT c_custkey AS custkey, c_mktsegment AS seg_old,
      |    c_acctbal AS bal_old, 1 AS in_old
      |  FROM customer),
      |snap AS (
      |  SELECT c_custkey AS custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg_new,
      |    CASE WHEN c_custkey % 11 = 4 THEN c_acctbal + 50.0 ELSE c_acctbal END AS bal_new,
      |    1 AS in_new
      |  FROM customer WHERE c_custkey % 13 != 6
      |  UNION ALL
      |  SELECT c_custkey + (SELECT MAX(c_custkey) + 1 FROM customer) AS custkey,
      |    'NEW' AS seg_new, 0.0 AS bal_new, 1 AS in_new
      |  FROM customer WHERE c_custkey % 97 = 0),
      |j AS (
      |  SELECT COALESCE(base.custkey, snap.custkey) AS custkey,
      |    seg_old, bal_old, in_old, seg_new, bal_new, in_new,
      |    (in_old IS NOT NULL AND in_new IS NOT NULL AND
      |     (seg_old IS DISTINCT FROM seg_new
      |      OR bal_old IS DISTINCT FROM bal_new)) AS changed
      |  FROM base FULL OUTER JOIN snap ON base.custkey = snap.custkey),
      |hist AS (
      |  SELECT custkey, seg_old AS segment, bal_old AS acctbal,
      |    DATE '1995-01-01' AS valid_from,
      |    CASE WHEN changed OR in_new IS NULL THEN DATE '1996-01-01' END AS valid_to,
      |    CASE WHEN changed OR in_new IS NULL THEN 0 ELSE 1 END AS is_current
      |  FROM j WHERE in_old IS NOT NULL
      |  UNION ALL
      |  SELECT custkey, seg_new AS segment, bal_new AS acctbal,
      |    DATE '1996-01-01' AS valid_from,
      |    CAST(NULL AS DATE) AS valid_to, 1 AS is_current
      |  FROM j WHERE in_new IS NOT NULL AND (changed OR in_old IS NULL))""".stripMargin

  val scd2Sql: String =
    s"""WITH $scd2HistoryCte
       |SELECT custkey, segment, acctbal, valid_from, valid_to, is_current
       |FROM hist ORDER BY custkey, valid_from""".stripMargin

  /** Q-asof-dim: POINT-IN-TIME join against the SCD2 history — the
    * consumer side of [[scd2]], and the reason type-2 history exists at
    * all: every order joins the dimension version VALID AT its order
    * date (`valid_from <= d < valid_to`), so 1995 orders see the original
    * segment, 1996+ orders see the post-move segment, and a churned
    * customer's post-close-out orders match no version (orphans drop —
    * the audit signal, not a bug). Revenue then aggregates by the
    * temporally-correct segment; a naive join against the CURRENT
    * dimension would misattribute every pre-change order.
    *
    * Scale shape: this is an EQUI-join on the dimension key — the
    * interval predicate filters within a key's version list, which is
    * tiny (≤ 2 here; bounded by change frequency in general), so the
    * plan is the ordinary fact⋈dim hash/sort-merge join, never a range
    * or theta join. The revenue sum is exact-decimal (order-free,
    * partial-aggregated). */
  def asofDim(spark: SparkSession, dir: String): DataFrame = {
    val hist = scd2History(spark, dir)
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_totalprice"))
    orders.join(hist,
        orders("o_custkey") === hist("custkey") &&
          col("od") >= col("valid_from") &&
          (col("valid_to").isNull || col("od") < col("valid_to")))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(38,18)"))
          .cast("double"), 3).as("revenue"))
      .orderBy(col("segment"))
  }

  val asofDimSql: String =
    s"""WITH $scd2HistoryCte
       |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,18))) AS DOUBLE), 3) AS revenue
       |FROM orders o JOIN hist h
       |  ON o.o_custkey = h.custkey
       | AND CAST(o.o_orderdate AS DATE) >= h.valid_from
       | AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < h.valid_to)
       |GROUP BY segment ORDER BY segment""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> (fuzzyJoin _),
    "q_table_diff" -> (tableDiff _),
    "q_scd2" -> (scd2 _),
    "q_asof_dim" -> (asofDim _))

  def oracles: Map[String, String] = Map(
    "q_fuzzy_join" -> fuzzyJoinSql,
    "q_table_diff" -> tableDiffSql,
    "q_scd2" -> scd2Sql,
    "q_asof_dim" -> asofDimSql)
}
