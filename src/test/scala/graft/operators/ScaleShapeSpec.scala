package graft.operators

import graft.{SparkSpecBase, Tables}
import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Tests for the scale-shape utilities: the assertions are about PLANS
  * (exchanges eliminated, equi-join not nested-loop) as much as results.
  */
class ScaleShapeSpec extends SparkSpecBase with Matchers {

  test("salted join is row-identical to the plain join") {
    val orders = Tables.orders(spark, sfDir).withColumnRenamed("o_custkey", "custkey")
    val customer = Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "custkey")
    val plain = orders.join(customer, Seq("custkey"))
      .select("o_orderkey", "c_name").collect().map(_.toString).sorted
    val salted = Salting.saltedJoin(orders, customer, "custkey", numSalts = 7)
      .select("o_orderkey", "c_name").collect().map(_.toString).sorted
    salted shouldBe plain
  }

  test("range join via binning equals the naive range join and avoids nested loop") {
    val events = Tables.events(spark, sfDir)
    val binned = RangeJoin.countWithin(events, "purchase", "click", 600L)
    // naive reference computation
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("ct"))
    val naive = p.join(c, p("user_id") === col("cu") &&
        abs(col("t") - col("ct")) <= 600L * 1000000L, "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("ct")).as("n_close"))
      .orderBy(col("event_id"))
    binned.collect().map(_.toString) shouldBe naive.collect().map(_.toString)
    // the binned plan must be an equi-join, not BroadcastNestedLoopJoin
    binned.collect()
    binned.queryExecution.executedPlan.toString should not include "NestedLoop"
  }

  test("bucketed tables join with no shuffle exchange") {
    // warehouse dir is a static conf; the default ./spark-warehouse is
    // gitignored and fine for the test catalog. The catalog is in-memory
    // per JVM but the location persists — clear both or saveAsTable
    // refuses the orphaned directory.
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).withColumnRenamed("o_custkey", "custkey"),
      "orders_b", "custkey", 8)
    Bucketing.writeBucketed(
      Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "custkey"),
      "customer_b", "custkey", 8)
    val joined = Bucketing.table(spark, "orders_b")
      .join(Bucketing.table(spark, "customer_b"), Seq("custkey"))
    joined.collect().length should be > 0
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join reads pre-bucketed data, no Exchange on either side
    plan should not include "Exchange hashpartitioning"
  }
}
