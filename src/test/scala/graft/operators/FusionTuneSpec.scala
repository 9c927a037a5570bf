package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Gates for the hybrid fusion frontier (value correctness is
  * oracle-gated — q_fusion_tune hash-matches DuckDB end-to-end including
  * the truth derivation and both arms).
  *
  * Theorem gates: the ladder/chosen contract and the MRR range (best
  * reciprocal rank is 1). Measured gates (the IvfTuneSpec discipline)
  * state the frontier's reason to exist on THIS corpus: the near-dup
  * retrieval task is entirely lexical — gram-BM25 ranks every query's
  * true duplicate first, the text-independent synthetic embeddings
  * measure ≈0, and every RRF mix pays measurable dilution for fusing in
  * the noise arm (the hard-coded k=60 default costs ~2/3 of attainable
  * MRR here — exactly the adjudication this sweep exists to automate). */
class FusionTuneSpec extends SparkSpecBase with Matchers {

  private lazy val rows = FusionTune.fusionTune(spark, sfDir).collect()
  private def mrr(cfg: String): Double =
    rows.find(_.getAs[String]("config") == cfg).get.getAs[Double]("mrr")

  test("one row per config in ladder order; MRR within [0, 1]; hits within the block") {
    rows.map(_.getAs[String]("config")).toSeq shouldBe
      FusionTune.Configs.map(_._2)
    rows.foreach { r =>
      val m = r.getAs[Double]("mrr")
      m should (be >= 0.0 and be <= 1.0)
      r.getAs[Long]("n_hit") should be <= r.getAs[Long]("n_q")
      if (m > 0.0) r.getAs[Long]("n_hit") should be > 0L
    }
  }

  test("chosen is the first ladder entry attaining the maximum MRR") {
    val best = rows.map(_.getAs[Double]("mrr")).max
    val firstBest = rows.filter(_.getAs[Double]("mrr") == best)
      .map(_.getAs[Int]("ord")).min
    rows.filter(_.getAs[Boolean]("chosen"))
      .map(_.getAs[Int]("ord")).toSeq shouldBe Seq(firstBest)
  }

  test("measured: the near-dup task is lexical — gram-BM25 is perfect, the dense arm is noise") {
    mrr("lex") shouldBe 1.0
    mrr("dense") should be < 0.1
    // every query found its duplicate through the lexical arm
    val lexRow = rows.find(_.getAs[String]("config") == "lex").get
    lexRow.getAs[Long]("n_hit") shouldBe lexRow.getAs[Long]("n_q")
  }

  test("q_fusion_serve: partition-pruned gram index, sane rankings, planted dups surface at rank 1") {
    import org.apache.spark.sql.functions.col
    val df = FusionTune.fusionServe(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the posting scan reads only the block grams' bucket directories
    plan should include regex "PartitionFilters: \\[tbucket#\\d+ IN"
    val rows = df.collect()
    rows should not be empty
    // per query: ranks are 1..k, scores descend, self never returned
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      sorted.map(_.getAs[Int]("rank")).toSeq shouldBe (1 to g.length)
      val scores = sorted.map(_.getAs[Double]("score"))
      scores.zip(scores.tail).foreach { case (a, b) => b should be <= a }
      g.map(_.getLong(1)) should not contain q
    }
    // the tune's finding, served: every truth-pair partner of a block
    // member ranks FIRST (measured precondition: the block intersects
    // the planted dups on this corpus — assert non-vacuously only then)
    val truth = Dedup.ngramJaccardPairs(
        graft.Tables.documents(spark, sfDir), 0.8, maxDf = FusionTune.MaxDf)
      .select(col("doc_a"), col("doc_b")).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val partnersByQ = truth
      .filter(_._1 % FusionTune.ServeSampleMod == FusionTune.ServeSampleRes)
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val top1 = rows.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    partnersByQ.foreach { case (q, dups) =>
      withClue(s"query $q, planted dups $dups:") {
        dups should contain(top1(q))
      }
    }
  }

  test("gram-index lifecycle: tokenizer-matched upsert + delete + vacuum stays internally consistent") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
    import graft.sources.{IndexCatalog, InvertedIndex, Maintenance}
    FusionTune.ensureGramIndex(spark, sfDir)
    val cloneRoot = Paths.get(graft.Scratch.dir("gram-lifecycle"))
    Maintenance.copyTree(Paths.get(IndexCatalog.cacheBase(sfDir),
      FusionTune.GramIndexName), cloneRoot)
    val layout = InvertedIndex.Layout(
      cloneRoot.resolve("data").toString,
      cloneRoot.resolve("dict").toString,
      cloneRoot.resolve("stats").toString)
    val docs = graft.Tables.documents(spark, sfDir)
    val twins = docs.filter(col("doc_id") < 3)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
    // upsert MUST use the index's build tokenizer (gram shingles)
    InvertedIndex.upsertDocs(spark, layout, twins) // tokenizer from the marker
    val post1 = spark.read.parquet(layout.dataPath)
    post1.filter(col("doc_id") === 9000001L).count() should be > 0L
    InvertedIndex.deleteDocs(spark, layout,
      twins.filter(col("doc_id") === 9000000L).select(col("doc_id")))
    InvertedIndex.vacuum(spark, layout)
    val post = spark.read.parquet(layout.dataPath)
    post.filter(col("doc_id") === 9000000L).count() shouldBe 0L
    // dict == df recomputed from surviving postings; stats n == doc count
    val fromData = post.groupBy(col("w")).agg(count(lit(1)).as("df")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    spark.read.parquet(layout.dictPath).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq shouldBe fromData
    val n = spark.read.parquet(layout.statsPath).head().getLong(0)
    post.agg(countDistinct(col("doc_id"))).head().getLong(0) shouldBe n
  }

  test("q_gram_upsert: the grown index serves shifted rankings and the shared cache stays untouched") {
    import java.nio.file.{Files, Paths}
    FusionTune.ensureGramIndex(spark, sfDir)
    val cacheData = Paths.get(graft.sources.IndexCatalog.cacheBase(sfDir),
      FusionTune.GramIndexName, "data")
    val before = Files.getLastModifiedTime(cacheData)
    val grown = FusionTune.gramUpsert(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    Files.getLastModifiedTime(cacheData) shouldBe before
    grown should not be empty
    // the twins shift n/avgdl/df, so the served scores cannot all match
    // the base index's
    val base = FusionTune.fusionServe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    grown.toSeq should not be base.toSeq
  }

  test("measured: fusing in a noise arm dilutes, and more so at larger k") {
    // RRF with a random arm cannot beat the good arm alone; smaller k
    // (stronger top-rank emphasis) preserves more of the lexical signal
    mrr("lex") should be > mrr("rrf10")
    mrr("rrf10") should be > mrr("rrf60")
    mrr("rrf60") should be >= mrr("rrf240")
    mrr("rrf60") should be > mrr("dense")
  }
}
