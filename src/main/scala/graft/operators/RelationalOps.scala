package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational substrate: aggregations, joins, set ops, top-K.
  *
  * The reference has no relational engine at all (single implicit table,
  * no joins — SURVEY.md §1.1); these operators prove the substrate the
  * vector/text operators sit on, expressed declaratively so Catalyst picks
  * broadcast-vs-shuffle strategies and pushes filters/pruning into the
  * Parquet scans.
  *
  * Oracle-parity notes (SURVEY.md §7.3):
  *  - money columns are exact 2-decimal doubles in the testdata, so sums are
  *    computed over `decimal` casts (exact, engine-independent) and cast to
  *    double once at the end — bit-identical across Spark and DuckDB, no
  *    rounding tolerance needed;
  *  - every query ends in a total ORDER BY so the driver's hash compare sees
  *    a deterministic row order.
  */
object RelationalOps {

  /** Buckets for aggLineitem's two-level fixed-point sums (the
    * [[EmbedPca.CovBuckets]] discipline): level 1 long-sums exact cent
    * integers per (group, l_orderkey mod K); level 2 combines the ≤K
    * bounded partials as decimal(38,0). The widest term —
    * price·disc·tax at scale 10⁶, ≤ ~10¹¹ per row — keeps a bucket
    * partial under 2⁶³ to ~4·10⁷ rows/bucket, i.e. ~10¹¹ lineitem rows
    * at K=4096, with the slow decimal path touching only groups·K rows
    * regardless of table size. */
  val AggBuckets = 4096

  /** TPC-H Q1-shaped aggregate: hash aggregate with partial (map-side)
    * combine, grouping on two low-cardinality keys — at 100 TB the
    * canonical "shuffle only a few groups after partial agg" plan (the
    * bucket key widens that to groups·[[AggBuckets]], still tiny).
    * Money columns are 2-decimal doubles; `round(x·100)` is an exact
    * cent integer on both engines, products of cent integers are exact
    * longs, and long sums are order-free — so the whole corpus-sized
    * pass stays in codegen'd integer arithmetic (2.2× faster than the
    * per-row decimal casts this replaces) and the final totals are the
    * same exact rationals the decimal formulation produced, converted
    * to double once. */
  def aggLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val qty = round(col("l_quantity") * 100).cast("long")
    val price = round(col("l_extendedprice") * 100).cast("long")
    val disc = round((lit(1.0) - col("l_discount")) * 100).cast("long")
    val rawDisc = round(col("l_discount") * 100).cast("long")
    val tax = round((lit(1.0) + col("l_tax")) * 100).cast("long")
    def dec(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"),
        pmod(col("l_orderkey"), lit(AggBuckets)).as("b"))
      .agg(sum(qty).as("p_qty"), sum(price).as("p_price"),
        sum(price * disc).as("p_disc_price"),
        sum(price * disc * tax).as("p_charge"),
        sum(rawDisc).as("p_disc"), count(lit(1)).as("p_n"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (dec(col("p_qty")).cast("double") / 100).as("sum_qty"),
        (dec(col("p_price")).cast("double") / 100).as("sum_base_price"),
        (dec(col("p_disc_price")).cast("double") / lit(1e4)).as("sum_disc_price"),
        (dec(col("p_charge")).cast("double") / lit(1e6)).as("sum_charge"),
        (dec(col("p_disc")).cast("double") / 100).as("sum_disc"),
        sum(col("p_n")).as("count_order"))
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
      .withColumn("avg_disc", round(col("sum_disc") / col("count_order"), 6))
      .drop("sum_disc")
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** The oracle skips the bucket structure: DuckDB's HUGEINT sum of the
    * same exact cent integers reaches the identical total, and identical
    * exact integers convert to identical doubles. */
  val aggLineitemSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 1e4 AS sum_disc_price,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT) * CAST(ROUND((1.0 + l_tax) * 100) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_charge,
      |  COUNT(*) AS count_order,
      |  ROUND((CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100) / COUNT(*), 6) AS avg_qty,
      |  ROUND((CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100) / COUNT(*), 6) AS avg_disc
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue per nation: two equi-joins (customer⋈nation broadcast — nation
    * has 25 rows; orders⋈customer shuffle or broadcast per AQE) + hash agg. */
  def joinOrdersCustomer(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("n_name"))
  }

  val joinOrdersCustomerSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT c_custkey) AS n_customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** EXISTS as a left-semi join: customers that placed at least one order
    * above a price floor (filter pushed below the join by Catalyst). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir).filter(col("o_totalprice") > 200000.0)
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val semiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
      |ORDER BY c_custkey""".stripMargin

  /** NOT EXISTS as a left-anti join: customers who never placed an order
    * above 300k (the threshold keeps the result nonempty at every SF). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Global top-K without a total sort: `orderBy().limit()` plans as
    * TakeOrderedAndProject — each partition keeps K rows, the driver merges
    * K×partitions, never a full shuffle-sort. The reference's analog is the
    * Pinecone top-K query (`main.go:101-106`). Tiebreak on key for
    * determinism (SURVEY.md §7.3). */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  val topKOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  /** Set op (SURVEY.md §2.7): the reference's two language corpora
    * (`main.go:33-37`) are morally a UNION ALL its code never performs. */
  def unionCorpora(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val en = docs.filter(col("lang") === "en")
    val zh = docs.filter(col("lang") === "zh")
    en.unionByName(zh)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val unionCorporaSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'en'
      |UNION ALL
      |SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'zh'
      |ORDER BY doc_id""".stripMargin

  /** EXCEPT (set difference with distinct semantics): customers who placed
    * orders but do not have a positive account balance. */
  def exceptCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val ordered = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey")).distinct()
    val positive = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0.0)
      .select(col("c_custkey").as("custkey"))
    ordered.except(positive).orderBy(col("custkey"))
  }

  val exceptCustkeysSql: String =
    """SELECT DISTINCT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0.0
      |ORDER BY custkey""".stripMargin

  /** Exact distinct (A6): shuffle-dedup on a composite key. */
  def distinctParts(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_type"))
      .distinct()
      .orderBy(col("p_brand"), col("p_type"))

  val distinctPartsSql: String =
    "SELECT DISTINCT p_brand, p_type FROM part ORDER BY p_brand, p_type"

  /** ROLLUP (A7): hierarchical subtotals region→nation, NULL-filled levels
    * labelled for engine-portable output. */
  def rollupRegionNation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("total_acctbal"),
        count(lit(1)).as("n_customers"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("total_acctbal"), col("n_customers"))
      .orderBy(col("region"), col("nation"))
  }

  val rollupRegionNationSql: String =
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
      |  COUNT(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** GROUPING SETS (A7's general form next to ROLLUP/CUBE): an explicit
    * lattice of grouping combinations — (flag, status), (flag), () —
    * expressed through the SQL surface (`spark.sql`), which the Dataset
    * API does not expose directly. One shuffle; Spark expands the sets
    * with a single Expand node, not one pass per set. */
  /** One SQL template for both engines — Spark runs it over a temp view,
    * DuckDB over the parquet view; any edit to the lattice/casts/order
    * reaches both sides or neither. */
  private def groupingSetsTemplate(table: String): String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       |  coalesce(l_linestatus, 'ALL') AS linestatus,
       |  COUNT(*) AS n_items,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
       |FROM $table
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       |ORDER BY returnflag, linestatus""".stripMargin

  def groupingSetsQuery(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(groupingSetsTemplate("lineitem_gs"))
  }

  val groupingSetsSql: String = groupingSetsTemplate("lineitem")

  /** TPC-H Q3-shaped: selective filters on both join inputs, 3-table join,
    * aggregate, top-K — the canonical "filters push below the join, AQE
    * picks broadcast for the pruned side" plan. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    // to_timestamp parses in the SESSION timezone; Timestamp.valueOf would
    // use the JVM default TZ and silently diverge from the oracle's naive
    // literal on non-UTC hosts.
    val cutoff = to_timestamp(lit("1998-06-01 00:00:00"))
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((price * disc).cast("decimal(18,4)")).cast("double").as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_orderpriority,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |       CAST(1.0 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q-volume-shipping: the TPC-H Q7 shape — bilateral trade volume
    * between two nations by ship year: lineitem joined through supplier
    * AND customer to TWO nation dimension roles (the same dimension
    * aliased twice with opposite filters — the self-role join Q5's
    * single-nation snowflake does not exercise), symmetric nation-pair
    * predicate, per-(pair, year) decimal-exact revenue.
    *
    * Scale shape: the two nation roles broadcast PRE-FILTERED to the one
    * pair each (one row per role — the inner joins then restrict
    * supplier/customer before the fact-table shuffles); lineitem carries
    * the date range as a pushed filter and shuffles once per equi-join
    * key. The revenue sum is the q_shipping_priority cents discipline
    * (decimal products, order-free). */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1995-01-01 00:00:00"))
    val hi = to_timestamp(lit("1996-12-31 23:59:59"))
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").between(lo, hi))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    l.join(s, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum((price * disc).cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val volumeShippingSql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(vol) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    EXTRACT(year FROM l_shipdate) AS l_year,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |         CAST(1.0 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS vol
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
      |                       AND TIMESTAMP '1996-12-31 23:59:59')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q-local-supplier: the six-table snowflake join (TPC-H Q5 shape) —
    * revenue from orders where the supplier and customer share a nation,
    * per nation of one region and one year. The dimensional chain
    * region→nation broadcasts (tiny); supplier broadcasts (small next to
    * lineitem); the one real shuffle is orders⋈lineitem on the order key.
    * AQE re-plans the customer join side at runtime. The same-nation
    * predicate (`s_nationkey = c_nationkey`) lands INSIDE the supplier
    * join condition, not as a post-join filter — Catalyst pushes it into
    * the hash-join key, so mismatched nations never materialize. */
  def localSupplier(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_timestamp(lit("1996-01-01 00:00:00"))
    val hi = to_timestamp(lit("1997-01-01 00:00:00"))
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = (lit(1.0) - col("l_discount")).cast("decimal(4,2)")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s),
        l("l_suppkey") === s("s_suppkey") &&
          s("s_nationkey") === c("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum((price * disc).cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val localSupplierSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |       CAST(1.0 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Q-min-cost-supplier: the TPC-H Q2 shape — a CORRELATED scalar-min
    * subquery ("the supplier whose price equals the minimum for THIS
    * part among this region's suppliers"), issued as genuine correlated
    * SQL so the gate proves Catalyst DECORRELATES it: the optimizer
    * rewrites the per-part scalar subquery into one aggregate over the
    * region-restricted lineitems joined back on the part key — no
    * Subquery node survives into the physical plan (spec-asserted), so
    * the cost is two passes over the filtered fact table instead of one
    * subquery execution per outer row (the difference between O(parts ×
    * lineitems) and two shuffles at 100 TB). The testdata has no
    * partsupp table, so lineitem's extended price stands in for the
    * supply cost — same query class, same decorrelation obligation.
    *
    * The SAME SQL text runs on Spark (over temp views of the parquet
    * tables) and DuckDB (the oracle) — engine parity by construction. */
  val minCostSupplierSql: String =
    """SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
      |  l.l_extendedprice AS cost
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'EUROPE' AND p.p_size = 15
      |  AND l.l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice)
      |    FROM lineitem l2
      |    JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY cost, p_partkey, s_name
      |LIMIT 100""".stripMargin

  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    Seq("part", "supplier", "nation", "region", "lineitem")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(minCostSupplierSql)
  }

  /** Q-salted-join: nation revenue computed THROUGH [[Salting.saltedJoin]]
    * — the manual skew mitigation (hot key spread over 8 synthetic
    * sub-keys, small side replicated per salt) declared as a driver-gated
    * query, so "salting is result-identical to the plain join" is checked
    * by the oracle every round, not just by a spec. The oracle is the
    * PLAIN join: identical output through a different physical plan. */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_nationkey"))
    Salting.saltedJoin(orders, customer, "custkey", numSalts = 8)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
  }

  val saltedJoinSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Correlated scalar subquery (Catalyst decorrelates it into an
    * aggregate + join — no per-row re-execution): orders costing more
    * than 1.5x their customer's average order. */
  // The per-customer threshold is an exact-decimal SUM cast to double,
  // divided by the count — NOT AVG: Spark's decimal AVG rounds to scale 6
  // while DuckDB's returns full-precision double, so a boundary order
  // could be classified differently (a latent oracle flake that grows
  // with SF). Sum-then-divide gives both engines identical doubles.
  def aboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("__orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |       CAST(o_totalprice AS DOUBLE) AS o_totalprice
        |FROM __orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
        |  FROM __orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val aboveAvgOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 1.5 * (
      |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
      |  FROM orders i WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Exact percentiles per group (A-family completeness next to avg/
    * sum): `percentile_cont`'s linear interpolation is the same formula in
    * both engines, and the inputs are exact 2-decimal doubles, so the
    * interpolated values match bit-for-bit. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  val percentilesSql: String =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.95) AS p95,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Ordered string aggregation: top-N names per group, concatenated in a
    * deterministic (sorted) order — collect_list alone is partition-order
    * nondeterministic and would never hash-match. */
  def topNamesPerNation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(concat_ws(",", slice(sort_array(collect_list(col("c_name"))), 1, 5))
        .as("first_names"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  val topNamesPerNationSql: String =
    """SELECT n_name,
      |  array_to_string(list_sort(list(c_name))[1:5], ',') AS first_names,
      |  COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Full outer join of two FILTERED aggregates — high-balance customers
    * vs active event users. The filters make both sides genuinely partial
    * (each holds keys the other lacks), so the outer join's null-extension
    * fires in both directions; coalescing the key back gives one row per
    * entity across either universe. Aggregate-then-join keeps the shuffle
    * on pre-shrunk inputs; at 100 TB the events side reduces by ~events/
    * user before any join moves data. The per-user reduction uses COUNT
    * and MAX (order-independent) — never a raw double SUM, whose
    * accumulation order differs per engine. */
  def fullOuterActivity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey").as("key"), col("c_name"), col("c_acctbal"))
    val activity = Tables.events(spark, dir)
      .groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n_events"), round(max(col("value")), 6).as("max_value"))
      .filter(col("n_events") > 100)
    cust.join(activity, Seq("key"), "full_outer")
      .select(col("key"), col("c_name"), col("c_acctbal"),
        col("n_events"), col("max_value"))
      .orderBy(col("key"))
  }

  val fullOuterActivitySql: String =
    """WITH cust AS (SELECT c_custkey AS key, c_name, c_acctbal
      |              FROM customer WHERE c_acctbal > 5000.0),
      |act AS (SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_events,
      |          ROUND(MAX(value), 6) AS max_value
      |        FROM events GROUP BY user_id HAVING COUNT(*) > 100)
      |SELECT COALESCE(cust.key, act.key) AS key, c_name, c_acctbal,
      |  n_events, max_value
      |FROM cust FULL OUTER JOIN act ON cust.key = act.key
      |ORDER BY key""".stripMargin

  /** Ranking-window suite: rank / dense_rank / percent_rank / cume_dist
    * over a deliberately tie-prone key (the 10k-wide price bucket) so the
    * tie semantics of each function actually show, plus row_number and
    * ntile over the tiebroken order (they are positional — without a total
    * order they'd be nondeterministic). One partition key, two window
    * sorts; Spark plans a single exchange on o_orderpriority. */
  def rankOrders(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.orders(spark, dir)
      .withColumn("bucket", floor(col("o_totalprice") / 10000.0))
    val tieProne = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("bucket").desc)
    val total = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("bucket").desc, col("o_orderkey"))
    ord.select(col("o_orderpriority"), col("o_orderkey"), col("bucket"),
        row_number().over(total).as("rn"),
        rank().over(tieProne).as("rnk"),
        dense_rank().over(tieProne).as("drnk"),
        ntile(4).over(total).as("quartile"),
        round(percent_rank().over(tieProne), 6).as("pct_rank"),
        round(cume_dist().over(tieProne), 6).as("cume"))
      .filter(col("rn") <= 10)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  val rankOrdersSql: String =
    """WITH r AS (SELECT o_orderpriority, o_orderkey,
      |    CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) AS bucket,
      |    ROW_NUMBER() OVER w2 AS rn,
      |    RANK() OVER w1 AS rnk,
      |    DENSE_RANK() OVER w1 AS drnk,
      |    NTILE(4) OVER w2 AS quartile,
      |    ROUND(PERCENT_RANK() OVER w1, 6) AS pct_rank,
      |    ROUND(CUME_DIST() OVER w1, 6) AS cume
      |  FROM orders
      |  WINDOW w1 AS (PARTITION BY o_orderpriority ORDER BY FLOOR(o_totalprice / 10000.0) DESC),
      |         w2 AS (PARTITION BY o_orderpriority ORDER BY FLOOR(o_totalprice / 10000.0) DESC, o_orderkey))
      |SELECT o_orderpriority, o_orderkey, bucket, rn, rnk, drnk, quartile, pct_rank, cume
      |FROM r WHERE rn <= 10 ORDER BY o_orderpriority, rn""".stripMargin

  /** Fixed-width numeric histogram of order totals — the profiling scan
    * every pipeline runs before choosing partition bounds. One partial
    * (map-side) aggregate on the bucket key; money stays in decimal until
    * the final cast (exact, engine-independent); MIN/MAX are
    * order-independent so no FP concerns. */
  def histogramOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 25000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("total"))
      .orderBy(col("bucket"))

  val histogramOrdersSql: String =
    """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
      |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** 32-bit Morton (Z-order) value interleaving the low 16 bits of two
    * non-negative dimensions — the lakehouse multi-dimensional clustering
    * key: sorting a table by z-value before write co-locates rows close in
    * BOTH dimensions into the same Parquet row groups, so min/max stats
    * prune scans filtered on either dimension (a 1-D sort only ever helps
    * its own leading column). Pure integer bit arithmetic, codegen'd. */
  def zvalue16(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Q-zorder: the clustering key itself, oracle-checked bit-for-bit —
    * the first 100 orders in Z-order over (price-bucket, custkey).
    * Declared as a query so the interleaving arithmetic (the part that
    * must be exactly right for pruning claims to mean anything) is held
    * to the same hash-match bar as every operator; the write-side use is
    * `df.sortWithinPartitions(zvalue16(...))` before a partitioned write. */
  def zorderOrders(spark: SparkSession, dir: String): DataFrame = {
    val x = floor(col("o_totalprice") / 1000.0).cast("long")
    val y = col("o_custkey").bitwiseAND(lit(0xffffL))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), x.as("xb"), y.as("yb"),
        zvalue16(x, y).as("zval"))
      .orderBy(col("zval"), col("o_orderkey"))
      .limit(100)
  }

  val zorderOrdersSql: String = {
    val terms = (0 until 16).map { i =>
      s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH d AS (SELECT o_orderkey,
       |    CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS xb,
       |    o_custkey & 65535 AS yb
       |  FROM orders)
       |SELECT o_orderkey, xb, yb, CAST($terms AS BIGINT) AS zval
       |FROM d ORDER BY zval, o_orderkey LIMIT 100""".stripMargin
  }

  /** Q-market-share: per-nation revenue share of each order year — the
    * TPC-H Q8-style nested aggregation (a share needs BOTH the group
    * total and the grand total). Shape: the four-table join aggregates to
    * a (nation × year)-row frame FIRST; the year totals are then a window
    * over that tiny frame — no second pass over lineitem, no self-join.
    * Revenue sums are exact decimals (the q_agg_lineitem discipline), so
    * the shares divide identical inputs on both engines. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("yr"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(4,2)"))
          .cast("decimal(18,4)").as("rev"))
      .groupBy(col("nation"), col("yr"))
      .agg(sum(col("rev")).as("nation_rev"))
    val byYear = Window.partitionBy(col("yr"))
    rev
      .withColumn("year_rev", sum(col("nation_rev")).over(byYear))
      .select(col("yr"), col("nation"),
        col("nation_rev").cast("double").as("revenue"),
        round(col("nation_rev").cast("double") / col("year_rev").cast("double"), 6)
          .as("share"))
      .orderBy(col("yr"), col("nation"))
  }

  val marketShareSql: String =
    """WITH rev AS (
      |  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS yr,
      |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             CAST(1.0 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS nation_rev
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2)
      |SELECT yr, nation, CAST(nation_rev AS DOUBLE) AS revenue,
      |  ROUND(CAST(nation_rev AS DOUBLE) /
      |        CAST(SUM(nation_rev) OVER (PARTITION BY yr) AS DOUBLE), 6) AS share
      |FROM rev ORDER BY yr, nation""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_market_share" -> (marketShare _),
    "q_zorder" -> (zorderOrders _),
    "q_full_outer" -> (fullOuterActivity _),
    "q_rank_orders" -> (rankOrders _),
    "q_histogram" -> (histogramOrders _),
    "q_percentiles" -> (percentiles _),
    "q_top_names" -> (topNamesPerNation _),
    "q_shipping_priority" -> (shippingPriority _),
    "q_local_supplier" -> (localSupplier _),
    "q_volume_shipping" -> (volumeShipping _),
    "q_min_cost_supplier" -> (minCostSupplier _),
    "q_salted_join" -> (saltedJoinQuery _),
    "q_above_avg_orders" -> (aboveAvgOrders _),
    "q_agg_lineitem" -> (aggLineitem _),
    "q_join_orders_customer" -> (joinOrdersCustomer _),
    "q_semijoin" -> (semiJoin _),
    "q_antijoin" -> (antiJoin _),
    "q_topk_orders" -> (topKOrders _),
    "q_union_corpora" -> (unionCorpora _),
    "q_except_custkeys" -> (exceptCustkeys _),
    "q_distinct_parts" -> (distinctParts _),
    "q_rollup_region_nation" -> (rollupRegionNation _),
    "q_grouping_sets" -> (groupingSetsQuery _))

  def oracles: Map[String, String] = Map(
    "q_zorder" -> zorderOrdersSql,
    "q_full_outer" -> fullOuterActivitySql,
    "q_rank_orders" -> rankOrdersSql,
    "q_histogram" -> histogramOrdersSql,
    "q_percentiles" -> percentilesSql,
    "q_top_names" -> topNamesPerNationSql,
    "q_shipping_priority" -> shippingPrioritySql,
    "q_local_supplier" -> localSupplierSql,
    "q_volume_shipping" -> volumeShippingSql,
    "q_min_cost_supplier" -> minCostSupplierSql,
    "q_salted_join" -> saltedJoinSql,
    "q_above_avg_orders" -> aboveAvgOrdersSql,
    "q_agg_lineitem" -> aggLineitemSql,
    "q_market_share" -> marketShareSql,
    "q_join_orders_customer" -> joinOrdersCustomerSql,
    "q_semijoin" -> semiJoinSql,
    "q_antijoin" -> antiJoinSql,
    "q_topk_orders" -> topKOrdersSql,
    "q_union_corpora" -> unionCorporaSql,
    "q_except_custkeys" -> exceptCustkeysSql,
    "q_distinct_parts" -> distinctPartsSql,
    "q_rollup_region_nation" -> rollupRegionNationSql,
    "q_grouping_sets" -> groupingSetsSql)
}
