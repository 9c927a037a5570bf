package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for MaxScore-pruned BM25 serving (InvertedIndex.bm25MaxScore):
  * the pruned plan equals the unpruned one bit-for-bit through every
  * maintenance state (fresh build, post-upsert, pending tombstones,
  * post-vacuum), and the impacts sidecar keeps its bound contract (exact
  * after add-merge and after vacuum's refresh; valid always). */
class Bm25MaxScoreSpec extends SparkSpecBase with Matchers {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("q_bm25_maxscore equals q_bm25_indexed row-for-row") {
    rows(InvertedIndex.bm25MaxScore(spark, sfDir)) shouldBe
      rows(InvertedIndex.bm25Indexed(spark, sfDir))
  }

  test("pruning engages on this corpus: a strict essential subset, a smaller rank input") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val (essential, _) = InvertedIndex.maxScorePlan(spark, layout)
    // measured precondition, stable across SFs by the corpus's construction
    // (the three query terms' ubs are well-separated); if a corpus change
    // equalizes them, the algorithm legitimately falls back to scoring all
    // terms and only THIS diagnostic — not correctness — should fail
    essential.size should be < graft.operators.TextOps.Bm25Terms.size
    essential should not be empty
  }

  test("term generality: the 4-term query set serves exactly through both plans") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    rows(InvertedIndex.maxScorePlan(spark, layout,
        terms = InvertedIndex.Bm25Terms2)._2) shouldBe
      rows(InvertedIndex.bm25Over(spark, layout,
        terms = InvertedIndex.Bm25Terms2))
    rows(InvertedIndex.bm25Query2(spark, sfDir)) should not be empty
  }

  test("maxscore stays exact through upsert (bounds max/min-merged exactly)") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "maxscore-upsert")
    val newDocs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < InvertedIndex.UpsertSrcCount)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("text"))
    InvertedIndex.upsertDocs(spark, layout, newDocs)
    rows(InvertedIndex.maxScorePlan(spark, layout)._2) shouldBe
      rows(InvertedIndex.bm25Over(spark, layout))
    // the add-merge is exact: stored (tf_max, dl_min) equal a from-scratch
    // aggregation over the grown postings for the query terms
    val stored = spark.read.parquet(
        java.nio.file.Paths.get(layout.dataPath).getParent.resolve("impacts").toString)
      .filter(col("w").isin(graft.operators.TextOps.Bm25Terms: _*))
      .select(col("w"), col("tf_max"), col("dl_min")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    val truth = spark.read.parquet(layout.dataPath)
      .filter(col("w").isin(graft.operators.TextOps.Bm25Terms: _*))
      .groupBy(col("w")).agg(max(col("tf")).as("tf_max"),
        min(col("dl")).as("dl_min")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    stored shouldBe truth
  }

  test("maxscore stays exact under pending tombstones and after vacuum") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "maxscore-delete")
    val dead = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 13 === 2).select(col("doc_id"))
    InvertedIndex.deleteDocs(spark, layout, dead)
    // tombstones pending: bounds are valid-but-stale upper bounds and the
    // corrected df feeds the ubs — still bit-identical to the masked plan
    rows(InvertedIndex.maxScorePlan(spark, layout)._2) shouldBe
      rows(InvertedIndex.bm25Over(spark, layout))
    InvertedIndex.vacuum(spark, layout)
    rows(InvertedIndex.maxScorePlan(spark, layout)._2) shouldBe
      rows(InvertedIndex.bm25Over(spark, layout))
  }
}
