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
}
