package graft.streaming

import graft.SparkSpecBase
import graft.operators.{Dedup, GraphOps}
import graft.sources.{IndexCatalog, MinhashIndex}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the single-feed multi-index CDC (q_stream_all_cdc): after
  * ONE changelog replay, each artifact's end state must equal its own
  * incremental==rebuild form — the vector index a versioned-LWW replay,
  * the serving graph a from-scratch edge build over the survivors, the
  * minhash index the in-memory pair compute over the churned corpus,
  * the inverted + embed16 indexes the oracle-gated raw-text rebuilds
  * (driver compare, both arms of the declared result) — and a
  * redelivered combined trigger must be a no-op for every consumer at
  * once. */
class AllCdcSpec extends SparkSpecBase with Matchers {

  private lazy val state = AllCdc.streamAllCdcWithState(spark, sfDir)

  /** The churned corpus the feed's end state must equal. */
  private def churnedDocs = {
    val docs = graft.Tables.documents(spark, sfDir)
    docs.filter(!(col("doc_id") % AllCdc.DelMod === AllCdc.DelRes))
      .select(col("doc_id"), col("text"))
      .unionByName(docs
        .filter(col("doc_id") < AllCdc.AddCount && col("doc_id") =!= 0)
        .select((col("doc_id") + AllCdc.AddIdOffset).as("doc_id"), col("text")))
  }

  test("vector index end state equals the versioned replay over the final corpus") {
    val (_, _, _, _, vecBase, vecName, _, _) = state
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
    val (_, _, _, _, _, _, graphRoot, asgAll) = state
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

  test("minhash index end state serves the in-memory pairs of the churned corpus") {
    val (_, _, _, mh, _, _, _, _) = state
    val got = MinhashIndex.pairsFromIndex(spark, mh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Dedup.minhashLshPairs(churnedDocs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    got shouldBe expected
  }

  test("the declared result carries both text arms from the maintained stores") {
    val res = state._1.collect()
    res.map(_.getString(0)).distinct.sorted shouldBe Seq("bm25", "embed")
    res.count(_.getString(0) == "bm25") shouldBe 10
    res.count(_.getString(0) == "embed") shouldBe 5
    // no arm may surface a deleted doc or the re-deleted first twin
    res.map(_.getLong(1)).foreach { id =>
      (id % AllCdc.DelMod == AllCdc.DelRes && id < AllCdc.AddIdOffset) shouldBe false
      id should not be AllCdc.AddIdOffset
    }
  }

  test("a redelivered combined trigger is a no-op for all five consumers at once") {
    val (_, lex, embedIdx, mh, vecBase, vecName, graphRoot, asgAll) = state
    def lexState() = spark.read.parquet(lex.statsPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def embedState() = spark.read.parquet(embedIdx.statsPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def mhState() = spark.read.parquet(mh.sigsPath)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    def vecState() = IndexCatalog.load(spark, vecBase, vecName)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    def graphState() = spark.read.parquet(graphRoot.resolve("edges").toString)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (l0, e0, m0, v0, g0) =
      (lexState(), embedState(), mhState(), vecState(), graphState())
    // redeliver trigger 0 (the adds): lexical/embed/minhash + graph are
    // marker-inert, the vector merge is version-inert (v1 ≤ stored v1,
    // LWW keeps one). The FIRST twin is excluded: its delete was vacuumed
    // terminally, and re-adding a vacuumed-away id is the documented
    // id-reuse contract (redelivery windows close before vacuum in
    // production), not a redelivery no-op claim.
    val twins = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < AllCdc.AddCount && col("doc_id") =!= 0)
      .join(graft.Tables.embeddings(spark, sfDir)
        .withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select((col("doc_id") + AllCdc.AddIdOffset).as("id"), col("text"),
        col("embedding"), col("label"))
      .withColumn("op", lit("U")).withColumn("version", lit(1L))
    val dim = IndexCatalog.describe(vecBase, vecName).get.dimension
    AllCdc.applyAll(twins, batchId = 0L, lex, embedIdx, mh, vecBase, vecName,
      dim, graphRoot, asgAll)
    lexState() shouldBe l0
    embedState() shouldBe e0
    mhState() shouldBe m0
    vecState() shouldBe v0
    graphState() shouldBe g0
  }
}
