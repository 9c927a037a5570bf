package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Semantics of the round-6 training-pipeline operators: sequence
  * packing, overlap chunking, incremental dedup, cluster representative
  * selection, and source similarity. */
class TrainingPipelineSpec extends SparkSpecBase with Matchers {

  test("packSequences: two-phase prefix sum equals the naive global window") {
    val packed = PipelineOps.packSequences(spark, sfDir)
      .orderBy(col("doc_id")).collect()
    // the packed stream is gapless: each doc starts where the previous ended
    packed.head.getAs[Long]("start_tok") shouldBe 0L
    packed.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Long]("start_tok") shouldBe
        a.getAs[Long]("start_tok") + a.getAs[Long]("n_tokens")
    }
    // sequence ids follow from the span arithmetic
    packed.foreach { r =>
      val (s, n) = (r.getAs[Long]("start_tok"), r.getAs[Long]("n_tokens"))
      r.getAs[Long]("first_seq") shouldBe s / PipelineOps.PackBudget
      r.getAs[Long]("last_seq") shouldBe (s + math.max(n, 1) - 1) / PipelineOps.PackBudget
    }
  }

  test("chunkOverlap: windows tile every doc — stride-spaced, budget-capped, end at n_tokens") {
    val chunks = PipelineOps.chunkOverlap(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    chunks.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.head.getAs[Long]("start_tok") shouldBe 0L
      sorted.foreach { r =>
        r.getAs[Long]("start_tok") shouldBe
          r.getAs[Long]("chunk_idx") * PipelineOps.ChunkStride
        r.getAs[Long]("chunk_len") should be <= PipelineOps.ChunkSize
        r.getAs[Long]("chunk_len") should be > 0L
      }
      // all but the last window are full-size; the last ends exactly at n
      sorted.init.foreach(_.getAs[Long]("chunk_len") shouldBe PipelineOps.ChunkSize)
      if (sorted.length > 1) {
        val last = sorted.last
        // a second-to-last full window must not already reach the doc end
        (last.getAs[Long]("start_tok") + last.getAs[Long]("chunk_len")) should be >
          (sorted(sorted.length - 2).getAs[Long]("start_tok") + PipelineOps.ChunkSize - PipelineOps.ChunkStride)
      }
    }
  }

  test("incrementalDedup drops a batch doc near-duplicating the corpus, keeps novel ones") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("incdedup").toString
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    Seq(
      (1L, base, "en", "src0", base.length),                       // corpus
      (2L, "completely unrelated corpus text about other things entirely now", "en", "src1", 10),
      (10L, base + " tail", "en", "src15", base.length + 5),       // batch ≈ doc 1
      (11L, "fresh novel batch document with words shared by nobody else", "en", "src16", 10)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp + "/documents.parquet")
    val out = PipelineOps.incrementalDedup(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Long]("dup_of")), r.getAs[Boolean]("keep"))).toMap
    out(10L)._1.map(_.longValue) shouldBe Some(1L)
    out(10L)._2 shouldBe false
    out(11L) shouldBe (None, true)
    out.keySet shouldBe Set(10L, 11L) // corpus docs are never re-judged
  }

  test("clusterRepresentatives picks the longest member of each cluster") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
    val clusters = Dedup.resolveClusters(
      Dedup.nearDupPairs(graft.Tables.documents(spark, sfDir), 0.8)
        .select(col("doc_a"), col("doc_b")))
    val members = clusters.join(docs, "doc_id").collect()
      .groupBy(_.getAs[Long]("rep"))
    val reps = PipelineOps.clusterRepresentatives(spark, sfDir).collect()
    reps.length shouldBe members.size
    reps.foreach { r =>
      val best = members(r.getAs[Long]("cluster"))
        .map(m => (m.getAs[Long]("n_chars"), m.getAs[Long]("doc_id"))).sortBy { case (c, id) => (-c, id) }.head
      r.getAs[Long]("best_doc") shouldBe best._2
      r.getAs[Long]("best_chars") shouldBe best._1
      r.getAs[Long]("n_members") shouldBe members(r.getAs[Long]("cluster")).length.toLong
    }
  }

  test("interleave: virtual time is rank/weight and heavy sources front-load the stream") {
    val rows = PipelineOps.interleave(spark, sfDir).collect()
    rows.foreach { r =>
      r.getAs[Double]("mix_key") shouldBe
        r.getAs[Long]("rn").toDouble / r.getAs[Int]("w")
    }
    // in the first fifth of the schedule, weight-4 sources must outnumber
    // weight-1 sources ~4:1 — allow slack for per-source doc-count jitter
    val head = rows.take(rows.length / 5)
    val byW = head.groupBy(_.getAs[Int]("w")).view.mapValues(_.length).toMap
    byW.getOrElse(4, 0) should be > 2 * byW.getOrElse(1, 0)
  }

  test("bpePairs counts adjacent character pairs (hand-computed)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq((1L, "aaab aaab"), (2L, "ab x")) // 'x' is length-1: no pairs
      .toDF("doc_id", "text").write.parquet(tmp + "/documents.parquet")
    val pairs = PipelineOps.bpePairs(spark, tmp).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n")).toMap
    pairs("aa") shouldBe 4L // two per "aaab", twice
    pairs("ab") shouldBe 3L // one per "aaab" (x2) + the standalone "ab"
    pairs.keySet shouldBe Set("aa", "ab")
  }

  test("readability: hand-computed Flesch score") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("flesch").toString
    Seq((1L, "Hello world. It is good."))
      .toDF("doc_id", "text").write.parquet(tmp + "/documents.parquet")
    val r = PipelineOps.readability(spark, tmp).head()
    r.getAs[Int]("n_words") shouldBe 5
    r.getAs[Int]("n_sentences") shouldBe 2
    r.getAs[Int]("n_syllables") shouldBe 6
    // 206.835 - 1.015*(5/2) - 84.6*(6/5)
    r.getAs[Double]("flesch") shouldBe 102.7775 +- 1e-6
  }

  test("sourceSimilarity: valid Jaccard range, canonical pair order") {
    val sims = PipelineOps.sourceSimilarity(spark, sfDir).collect()
    sims should not be empty
    sims.foreach { r =>
      r.getAs[String]("src_a") should be < r.getAs[String]("src_b")
      val j = r.getAs[Double]("jaccard")
      j should be > 0.0
      j should be <= 1.0
    }
  }
}
