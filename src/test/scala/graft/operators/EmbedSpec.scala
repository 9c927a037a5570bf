package graft.operators

import graft.{SparkSpecBase, Tables}
import graft.sources.EmbeddingsCsv
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class EmbedSpec extends SparkSpecBase with Matchers {

  lazy val docs = Tables.documents(spark, sfDir)

  test("feature-hash embedding is unit-norm, fixed-dim, deterministic") {
    val idx = EmbedOps.buildIndex(docs)
    val stats = idx.agg(
      org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.size(col("embedding"))),
      org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.size(col("embedding"))),
      org.apache.spark.sql.functions.min(col("vec_norm")),
      org.apache.spark.sql.functions.max(col("vec_norm"))).head()
    stats.getInt(0) shouldBe EmbedOps.Dim
    stats.getInt(1) shouldBe EmbedOps.Dim
    stats.getDouble(2) shouldBe 1.0 +- 1e-6
    stats.getDouble(3) shouldBe 1.0 +- 1e-6
    // determinism: two independent builds agree exactly
    val a = idx.select("doc_id", "embedding").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = EmbedOps.buildIndex(docs).select("doc_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    a shouldBe b
  }

  test("identical texts embed identically; the search pipeline finds an exact copy first") {
    val target = docs.filter(col("doc_id") === 7).select("text").head().getString(0)
    val res = EmbedOps.searchByText(spark, EmbedOps.buildIndex(docs), target, 3).collect()
    res.head.getLong(0) shouldBe 7L
    res.head.getDouble(2) shouldBe 1.0 +- 1e-6
  }

  test("P6 response-shape flags prune the unrequested column out of the scan") {
    // parquet-backed index so pruning is observable in ReadSchema
    val tmp = java.nio.file.Files.createTempDirectory("graft-p6").toString + "/idx"
    EmbedOps.buildIndex(docs).write.parquet(tmp)
    val stored = spark.read.parquet(tmp)

    val lean = EmbedOps.searchByText(spark, stored, "vector query", 3,
      includeText = false, includeValues = false)
    lean.collect().length shouldBe 3
    lean.columns shouldBe Array("doc_id", "lang", "score")
    // executedPlan AFTER the action (AQE finalizes late)
    val leanScans = lean.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    leanScans should not include "text"

    val full = EmbedOps.searchByText(spark, stored, "vector query", 3,
      includeText = true, includeValues = true)
    full.collect().length shouldBe 3
    full.columns shouldBe Array("doc_id", "lang", "score", "text_head", "embedding")
    val fullScans = full.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    fullScans should include("text")
  }

  test("flagship entry returns k matches enriched with text (B3 fixed)") {
    val rows = graft.SparkEntry.entry(spark).collect()
    rows.length shouldBe 5
    all(rows.map(_.getString(3))) should not be empty
  }

  test("CSV roundtrip through real files preserves values to %f precision and ids exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/emb"
    val emb = Tables.embeddings(spark, sfDir)
    EmbeddingsCsv.write(emb, tmp)
    val back = EmbeddingsCsv.read(spark, tmp)
    back.count() shouldBe emb.count()
    val joined = emb.select(col("vec_id"), col("embedding").as("orig"))
      .join(back.withColumnRenamed("embedding", "rt"), "vec_id")
    val maxErr = joined.select(
      aggregate(zip_with(col("orig"), col("rt"),
        (a, b) => abs(a.cast("double") - b.cast("double"))),
        lit(0.0), (s, x) => greatest(s, x)).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    maxErr should be <= 1e-6
  }

  test("q_embed edge docs: whitespace-only text has no tokens (norm 0), unicode text embeds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // pins the exact semantics the q_embed oracle's no-token predicate
    // states: \s+ tokenization (tab/newline count as blank), not a
    // space-only trim
    val tmp = java.nio.file.Files.createTempDirectory("embed-edge").toString
    Seq((0L, "\t", "en", "s", 1L), (1L, " \n ", "en", "s", 3L),
        (2L, "naïve 中文", "en", "s", 8L), (3L, "x y", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp + "/documents.parquet")
    val out = EmbedOps.embed(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    out(0L) shouldBe ((64, 0.0))
    out(1L) shouldBe ((64, 0.0))
    out(2L) shouldBe ((64, 1.0))
    out(3L) shouldBe ((64, 1.0))
  }

  test("q_embed_knn_sql: the SQL-replayable flagship twin serves 5 ranked matches with positive overlap scores") {
    val rows = EmbedOps.embedKnnSqlQuery(spark, sfDir).collect()
    rows should have length 5
    // scores strictly descending-with-tiebreak and within (0, 1]
    val scores = rows.map(_.getDouble(2)).toSeq
    scores shouldBe scores.sorted.reverse
    all(scores) should (be > 0.0 and be <= 1.0)
    // the fetch-join really happened: every match carries its text head
    rows.foreach(r => r.getString(3).nonEmpty shouldBe true)
    // determinism: a second run is bit-identical (pure integer kernel)
    EmbedOps.embedKnnSqlQuery(spark, sfDir).collect()
      .map(_.toString).toSeq shouldBe rows.map(_.toString).toSeq
  }

  test("malformed CSV floats become NULL elements (intended semantics for ref bug B7)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp, "part-bad.txt"), "7,0.5,not_a_float,0.25\n")
    val r = EmbeddingsCsv.read(spark, tmp).head()
    r.getLong(0) shouldBe 7L
    val v = r.getSeq[Any](1)
    v.size shouldBe 3
    v(0) shouldBe 0.5f
    assert(v(1) == null) // ref leaves a silent 0.0 here (upsert/upsert.go:163)
    v(2) shouldBe 0.25f
  }
}
