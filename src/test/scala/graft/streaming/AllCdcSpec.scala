package graft.streaming

import graft.SparkSpecBase
import graft.operators.GraphOps
import graft.sources.IndexCatalog
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the single-feed multi-index CDC (q_stream_all_cdc): after
  * ONE changelog replay, each artifact's end state must equal its own
  * incremental==rebuild form — the vector index a versioned-LWW replay,
  * the serving graph a from-scratch edge build over the survivors, the
  * inverted index the oracle-gated BM25 rebuild (driver compare) — and a
  * redelivered combined trigger must be a no-op for every consumer at
  * once. */
class AllCdcSpec extends SparkSpecBase with Matchers {

  private lazy val state = AllCdc.streamAllCdcWithState(spark, sfDir)

  test("vector index end state equals the versioned replay over the final corpus") {
    val (_, _, vecBase, vecName, _, _) = state
    val got = IndexCatalog.load(spark, vecBase, vecName)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val emb = graft.Tables.embeddings(spark, sfDir)
    val expected = emb
      .filter(!(col("vec_id") % AllCdc.DelMod === AllCdc.DelRes))
      .select(col("vec_id"), col("label"))
      .unionByName(emb
        .filter(col("vec_id") < AllCdc.AddCount && col("vec_id") =!= 0)
        .select((col("vec_id") + AllCdc.AddIdOffset).as("vec_id"), col("label")))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    got shouldBe expected
  }

  test("serving graph end state equals the from-scratch edge build over the survivors") {
    val (_, _, _, _, graphRoot, asgAll) = state
    val got = spark.read.parquet(graphRoot.resolve("edges").toString)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val surviving = !(col("vec_id") % AllCdc.DelMod === AllCdc.DelRes) &&
      col("vec_id") =!= AllCdc.AddIdOffset
    val expected = GraphOps.graphAnnEdges(asgAll.filter(surviving)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe expected
    // ...and the reverse sidecar mirrors it exactly
    spark.read.parquet(graphRoot.resolve("redges").toString)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe expected
  }

  test("a redelivered combined trigger is a no-op for all three consumers at once") {
    val (_, lex, vecBase, vecName, graphRoot, asgAll) = state
    def lexState() = spark.read.parquet(lex.statsPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def vecState() = IndexCatalog.load(spark, vecBase, vecName)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    def graphState() = spark.read.parquet(graphRoot.resolve("edges").toString)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (l0, v0, g0) = (lexState(), vecState(), graphState())
    // redeliver trigger 0 (the adds): lexical + graph are marker-inert,
    // the vector merge is version-inert (v1 ≤ stored v1, LWW keeps one).
    // The FIRST twin is excluded: its delete was vacuumed terminally, and
    // re-adding a vacuumed-away id is the documented id-reuse contract
    // (redelivery windows close before vacuum in production), not a
    // redelivery no-op claim.
    val twins = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < AllCdc.AddCount && col("doc_id") =!= 0)
      .join(graft.Tables.embeddings(spark, sfDir)
        .withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select((col("doc_id") + AllCdc.AddIdOffset).as("id"), col("text"),
        col("embedding"), col("label"))
      .withColumn("op", lit("U")).withColumn("version", lit(1L))
    val dim = IndexCatalog.describe(vecBase, vecName).get.dimension
    AllCdc.applyAll(twins, batchId = 0L, lex, vecBase, vecName, dim,
      graphRoot, asgAll)
    lexState() shouldBe l0
    vecState() shouldBe v0
    graphState() shouldBe g0
  }
}
