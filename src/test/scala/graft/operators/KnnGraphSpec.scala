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
}
