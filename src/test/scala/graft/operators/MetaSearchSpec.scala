package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the map-typed metadata index (q_knn_meta): the hot key's
  * materialized partition column must prune the scan (PartitionFilters),
  * the cold key must be a genuine map lookup filtering BEFORE ranking
  * (pre-filter semantics), and every returned row must satisfy both
  * predicates. */
class MetaSearchSpec extends SparkSpecBase with Matchers {

  test("q_knn_meta: hot key prunes partitions, cold key filters the map") {
    val df = VectorOps.knnMeta(spark, sfDir)
    val rows = df.collect()
    rows.length shouldBe 10

    val plan = df.queryExecution.executedPlan.toString
    // hot key: lang=en as a partition filter — one directory scanned
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).mkString(" | ")
    pf should include("lang")
    // cold key: the element_at map lookup is a real post-scan filter
    // (map lookups cannot push into Parquet — that asymmetry is the
    // reason the hot key is materialized at build)
    plan should include("meta")
    pf should not include "meta"

    // every hit satisfies both predicates (derivations are deterministic)
    rows.foreach { r =>
      val vecId = r.getAs[Number](0).longValue
      val label = r.getAs[Number](1).longValue
      (vecId % 3) shouldBe 0L // lang = en
      (label % 2) shouldBe 0L // tier = gold
    }
  }

  test("q_knn_meta is pre-filter: k results whenever k candidates exist") {
    // the filtered candidate set at sf0.001 is far larger than k=10; a
    // post-filter implementation (top-10 of the full corpus, then filter)
    // would return fewer rows than 10 unless 10 of the global top-10
    // happen to match — build the brute filtered recompute and compare
    import graft.functions.VectorFunctions._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe")).head().getSeq[Float](0)
    val brute = emb
      .filter(col("vec_id") =!= 0 &&
        col("vec_id") % 3 === 0 && col("label") % 2 === 0)
      .withColumn("score", round(cosineSim(col("embedding"),
        typedlit[Seq[Float]](q)), 6))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("label"), col("score"))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getDouble(2)))
    val got = VectorOps.knnMeta(spark, sfDir)
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getDouble(2)))
    got should contain theSameElementsInOrderAs brute
  }
}
