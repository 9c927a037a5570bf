package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Gates for the k-NN-graph construction (GraphOps.knnGraph): the
  * mutuality join must be a merge join (no N-proportional broadcast —
  * the directed-edge build inside knnJoinLarge carries its own
  * no-broadcast assert in KnnSpec), edges must be lower-id oriented, and
  * every emitted edge must exist in BOTH endpoints' directed top-3 lists
  * with the symmetric score. */
class KnnGraphSpec extends SparkSpecBase with Matchers {

  test("q_knn_graph: merge-joined mutual edges, both directions present, scores symmetric") {
    val g = GraphOps.knnGraph(spark, sfDir)
    val plan = g.queryExecution.executedPlan.toString
    plan should include("SortMergeJoin")
    plan should not include "BroadcastExchange"
    val rows = g.collect()
    rows should not be empty

    val directed = KnnSearch
      .knnJoinLarge(graft.Tables.embeddings(spark, sfDir), dim = 64, k = 3)
      .select("query_id", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val (s, d, score) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      withClue(s"edge ($s,$d):") {
        s should be < d
        directed.keySet should contain((s, d))
        directed.keySet should contain((d, s))
        // cosine is symmetric, and both directions rounded identically
        score shouldBe directed((s, d))
        score shouldBe directed((d, s))
      }
    }
  }

  test("q_graph_ann: recall gate, cross-bucket edges exist, degree bound, query node never visited") {
    import org.apache.spark.sql.functions.col
    val emb = KnnSearch.withNorm(graft.Tables.embeddings(spark, sfDir))
    val q = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val exact = KnnSearch.topK(emb, q, 10).select("vec_id").collect().map(_.getLong(0)).toSet
    val got = GraphOps.graphAnn(spark, sfDir).collect()
    got.map(_.getLong(0)) should not contain 0L // out-of-graph query contract
    val recall = got.map(_.getLong(0)).count(exact) / 10.0
    withClue(s"recall@10 vs exact brute force ($recall):") {
      recall should be >= 0.6 // measured 0.7 at sf0.001; route+refine floor
    }

    val asg = GraphOps.ivfTop2Assignments(spark, sfDir)
    val edges = GraphOps.graphAnnEdges(asg).collect().map(r => (r.getLong(0), r.getLong(1)))
    val degree = edges.groupBy(_._1).map(_._2.length)
    all(degree) should be <= GraphOps.GraphAnnDegree
    // the navigability property: top-2 query-side assignment puts edges
    // ACROSS storage buckets (a single-assignment join cannot)
    val bucketOf = asg.filter(col("rn") === 1).select("vec_id", "cent_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    edges.count { case (s, d) => bucketOf(s) != bucketOf(d) } should be > 0
  }

  test("q_knn_graph_clusters: components cover exactly the strong-edge nodes, reps are component minima") {
    val edges = GraphOps.knnGraph(spark, sfDir).collect()
      .filter(_.getDouble(2) >= GraphOps.SemanticEdgeThreshold)
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = GraphOps.knnGraphClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strongNodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    clusters.keySet shouldBe strongNodes
    edges.foreach { case (a, b) =>
      withClue(s"strong edge ($a,$b):") {
        clusters(a) shouldBe clusters(b) // same component
      }
    }
    clusters.foreach { case (id, rep) =>
      rep should be <= id // keep-lowest representative rule
      clusters(rep) shouldBe rep // reps are their own reps
    }
  }

  test("q_knn_graph_incr: incremental fold is bit-identical to the full rebuild; batch side broadcasts") {
    import org.apache.spark.sql.functions.col
    // the maintenance scan broadcasts the BATCH side (it is batch-sized;
    // the full rebuild's merge hint exists because neither side fits) —
    // asserted on the un-checkpointed scan, where the join is visible
    val all = graft.Tables.embeddings(spark, sfDir)
    val nb = GraphOps.incrBucketed(all.filter(col("vec_id") % 50 === 0)).select(
      col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
      col("vec_norm").as("q_norm"), col("bucket"))
    val scanPlan = GraphOps.incrMaintenanceScan(
      GraphOps.incrBucketed(all.filter(!(col("vec_id") % 50 === 0))), nb)
      .queryExecution.executedPlan.toString
    scanPlan should include("BroadcastHashJoin")
    scanPlan should not include "SortMergeJoin"

    val full = GraphOps.knnGraph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val folded = GraphOps.knnGraphIncr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    folded shouldBe full
  }
}
