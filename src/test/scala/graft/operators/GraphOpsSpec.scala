package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Hand-computed semantics for the co-purchase graph operators. */
class GraphOpsSpec extends SparkSpecBase with Matchers {

  test("triangles counts a planted triangle exactly once") {
    import spark.implicits._
    val tmp = graft.Scratch.dir("graph") // self-deleting scratch root
    // orders 1 and 2 both hold parts {10, 20, 30} → edges 10-20, 10-30,
    // 20-30 each at support 2 → exactly one triangle. Order 3 adds a
    // support-1 pair (10, 40) that must be thresholded away.
    Seq((1L, 10L), (1L, 20L), (1L, 30L),
        (2L, 10L), (2L, 20L), (2L, 30L),
        (3L, 10L), (3L, 40L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(tmp + "/lineitem.parquet")
    val r = GraphOps.triangles(spark, tmp).head()
    r.getAs[Long]("n_edges") shouldBe 3L
    r.getAs[Long]("n_triangles") shouldBe 1L
  }

  test("pagerank: mass sums to 1 and the star hub ranks first") {
    import spark.implicits._
    val tmp = graft.Scratch.dir("graph")
    // star: hub part 1 co-ordered (twice each, to clear the support
    // threshold) with leaves 10..14 → hub degree 5, leaves degree 1.
    val rows = (10L to 14L).flatMap(leaf =>
      Seq((leaf * 2, 1L), (leaf * 2, leaf), (leaf * 2 + 1, 1L), (leaf * 2 + 1, leaf)))
    rows.toDF("l_orderkey", "l_partkey").write.parquet(tmp + "/lineitem.parquet")
    val r = GraphOps.pagerank(spark, tmp).collect()
    r.length shouldBe 6
    r.head.getAs[Long]("part") shouldBe 1L // hub collects 0.85 of each leaf's mass
    r.map(_.getAs[Double]("pagerank")).sum shouldBe 1.0 +- 1e-5
    // leaves are symmetric → identical rank
    r.tail.map(_.getAs[Double]("pagerank")).toSet.size shouldBe 1
  }

  test("directed pagerank: planted dangling node — mass conserved, hand-computed ranks") {
    import spark.implicits._
    // chain 1 → 2 → 3 with 3 dangling (no out-edges). N=3. Hand-compute
    // one iteration from uniform pr=1/3:
    //   dm = pr(3) = 1/3
    //   pr'(1) = 0.15/3 + 0.85*(0 + (1/3)/3)        = 0.05 + 0.85/9
    //   pr'(2) = 0.15/3 + 0.85*((1/3)/1 + (1/3)/3)  (in from 1, deg 1)
    //   pr'(3) = same as pr'(2)                      (in from 2, deg 1)
    // A dangling-UNAWARE iteration would give pr'(1) = 0.05 and total
    // mass 1 - 0.85*dm ≈ 0.717 — the leak this operator closes.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val r1 = GraphOps.pagerankDirectedIterations(edges, 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pr")).toMap
    r1(1L) shouldBe (0.05 + 0.85 / 9.0) +- 1e-12
    r1(2L) shouldBe (0.05 + 0.85 * (1.0 / 3 + 1.0 / 9)) +- 1e-12
    r1(3L) shouldBe (0.05 + 0.85 * (1.0 / 3 + 1.0 / 9)) +- 1e-12
    r1.values.sum shouldBe 1.0 +- 1e-12

    // mass stays conserved across further iterations (the dangling node's
    // rank is redistributed, never dropped)
    val r3 = GraphOps.pagerankDirectedIterations(edges, 3)
      .collect().map(_.getAs[Double]("pr"))
    r3.sum shouldBe 1.0 +- 1e-12
  }

  test("affinity support equals the true co-order count; Jaccard is consistent") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val byPart = li.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    GraphOps.affinity(spark, sfDir).collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val inter = (byPart(a) intersect byPart(b)).size.toLong
      r.getAs[Long]("n_orders") shouldBe inter
      r.getAs[Double]("jaccard") shouldBe
        BigDecimal(inter.toDouble / (byPart(a).size + byPart(b).size - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    }
  }
}
