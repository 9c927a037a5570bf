package graft.operators

import graft.{SparkSpecBase, Tables}
import org.scalatest.matchers.should.Matchers

/** Reconciliation semantics: blocking must be lossless against the brute
  * force it replaces (for in-block pairs — that restriction is the
  * documented contract), and the snapshot diff must partition the union
  * keyspace into exactly the four classes. */
class ReconcileOpsSpec extends SparkSpecBase with Matchers {

  /** Classic unit-cost Levenshtein, the independent referee for both
    * engines' built-ins. */
  private def lev(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  test("fuzzy join equals brute force within blocks and never plans a cross product") {
    val q = ReconcileOps.fuzzyJoin(spark, sfDir)
    val out = q.collect()
    assert(out.nonEmpty, "the part-name vocabulary plants near-matches; zero pairs means the query is broken")
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      r.getInt(2) shouldBe lev(a, b)
      r.getInt(2) should be <= ReconcileOps.FuzzyMaxDist
      a.split(' ').last shouldBe b.split(' ').last
    }
    val names = Tables.part(spark, sfDir)
      .select("p_name").distinct().collect().map(_.getString(0))
    val expected = (for {
      a <- names; b <- names
      if a < b && a.split(' ').last == b.split(' ').last &&
        lev(a, b) <= ReconcileOps.FuzzyMaxDist
    } yield (a, b)).toSet
    out.map(r => (r.getString(0), r.getString(1))).toSet shouldBe expected
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"blocked matching must stay an equi-join:\n$plan")
  }

  test("diff classes partition the union keyspace with independently recomputed counts") {
    val ids = Tables.events(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0))
    val inOld = ids.filter(_ % 11 != 3).toSet
    val inNew = ids.filter(_ % 13 != 5).toSet
    val both = inOld intersect inNew
    val expected = Map(
      "added" -> (inNew diff inOld).size.toLong,
      "removed" -> (inOld diff inNew).size.toLong,
      "changed" -> both.count(_ % 7 == 0).toLong, // +1.0 drift on ordinary doubles
      "unchanged" -> both.count(_ % 7 != 0).toLong)
    val out = ReconcileOps.tableDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.filter(_._2 > 0) shouldBe out
    out.values.sum shouldBe (inOld union inNew).size.toLong
  }

  test("scd2 merge emits a valid type-2 history for every key class") {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val out = ReconcileOps.scd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        Option(r.getDate(3)).map(_.toString).orNull,
        Option(r.getDate(4)).map(_.toString).orNull,
        r.getInt(5)))
    val byKey = out.groupBy(_._1)
    val maxKey = cust.map(_._1).max + 1 // 0-based keys: offset must clear the domain

    // global SCD2 invariants: at most one current row per key; a closed
    // row's valid_to equals the successor's valid_from when one exists
    byKey.foreach { case (key, rows) =>
      withClue(s"key $key: ") {
        rows.count(_._6 == 1) should be <= 1
        rows.foreach { r => if (r._6 == 1) r._5 shouldBe null }
        rows.foreach { r => if (r._6 == 0) r._5 shouldBe "1996-01-01" }
      }
    }

    cust.foreach { case (key, bal, seg) =>
      val rows = byKey(key).sortBy(_._4)
      val churned = key % 13 == 6
      val segNew = if (key % 7 == 0) "MOVED" else seg
      val balNew = if (key % 11 == 4) bal + 50.0 else bal
      val changed = !churned && (segNew != seg || balNew != bal)
      withClue(s"key $key (churned=$churned changed=$changed): ") {
        if (churned) // close-out: single closed row, no successor
          rows.toSeq shouldBe Seq((key, seg, bal, "1995-01-01", "1996-01-01", 0))
        else if (changed)
          rows.toSeq shouldBe Seq(
            (key, seg, bal, "1995-01-01", "1996-01-01", 0),
            (key, segNew, balNew, "1996-01-01", null, 1))
        else
          rows.toSeq shouldBe Seq((key, seg, bal, "1995-01-01", null, 1))
      }
      if (key % 97 == 0) // insert path: re-keyed row appears as new-current
        byKey(key + maxKey).toSeq shouldBe Seq(
          (key + maxKey, "NEW", 0.0, "1996-01-01", null, 1))
    }
    // no rows beyond the derived keyspace
    val expectedKeys = cust.map(_._1).toSet ++
      cust.map(_._1).filter(_ % 97 == 0).map(_ + maxKey)
    byKey.keySet shouldBe expectedKeys
  }

  test("point-in-time join attributes each order to the version valid at its date") {
    import org.apache.spark.sql.functions.{col, to_date}
    val out = ReconcileOps.asofDim(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // referee: version lookup per order in plain Scala
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
    val attributed = orders.flatMap { case (ck, od, price) =>
      cust.get(ck).flatMap { case (_, seg) =>
        val churned = ck % 13 == 6
        val segNew = if (ck % 7 == 0) "MOVED" else seg
        if (od < "1996-01-01") Some(seg -> price) // version 1 valid [1995, 1996)
        else if (churned) None // closed out, no valid version
        else Some(segNew -> price)
      }
    }
    val expected = attributed.groupBy(_._1).map { case (seg, rows) =>
      seg -> (rows.size.toLong,
        rows.map(r => BigDecimal(r._2)).sum
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    out.keySet shouldBe expected.keySet
    out.foreach { case (seg, (n, rev)) =>
      withClue(s"segment $seg: ") {
        n shouldBe expected(seg)._1
        rev shouldBe expected(seg)._2 +- 0.001
      }
    }
    // churn is visible: post-1996 orders of churned customers drop
    val orphans = orders.count { case (ck, od, _) =>
      cust.contains(ck) && ck % 13 == 6 && od >= "1996-01-01" }
    orders.size - attributed.size shouldBe orphans
    assert(orphans > 0, "corpus has churned customers with post-close-out orders")
  }
}
