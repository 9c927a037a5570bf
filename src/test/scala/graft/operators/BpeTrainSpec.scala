package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** BPE training gates: the exact merge sequence on a hand-computed
  * vocabulary (the classic Sennrich-style example), kernel edge cases,
  * and determinism on the real corpus — iterative argmax training has no
  * SQL twin, so q_bpe_train is rows-only by design. */
class BpeTrainSpec extends SparkSpecBase with Matchers {

  test("learned merges match the hand-computed sequence on the classic vocabulary") {
    import spark.implicits._
    // weighted pair counts by hand:
    //   (u,g)=20 → merge 1; then (u,n)=16 → merge 2; (h,ug)=15 → merge 3;
    //   (p,un)=12 → merge 4; then (hug,s)=5 ties (p,ug)=5 and wins
    //   lexicographically ("hug" < "p") → merge 5
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
      ("hugs", 5L)).toDF("w", "wc")
    val merges = PipelineOps.bpeTrainCore(words)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    merges.toSeq shouldBe Seq(
      (1, "u", "g", 20L), (2, "u", "n", 16L), (3, "h", "ug", 15L),
      (4, "p", "un", 12L), (5, "hug", "s", 5L))
  }

  test("merge kernel is leftmost-first and non-overlapping") {
    import spark.implicits._
    val out = Seq(Seq("a", "a", "a"), Seq("b", "a", "a"), Seq("a", "b"))
      .toDF("s")
      .select(graft.functions.BpeMergePair.merge(
        org.apache.spark.sql.functions.col("s"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq("aa", "a") // leftmost pair merges, no overlap
    out(1) shouldBe Seq("b", "aa")
    out(2) shouldBe Seq("a", "b") // no occurrence → unchanged
  }

  test("local (two-level) training matches the distributed path exactly") {
    import spark.implicits._
    // the classic vocabulary, incl. the lexicographic tie at merge 5
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
      ("hugs", 5L)).toDF("w", "wc")
    PipelineOps.bpeTrainLocal(words).collect().map(_.toString).toSeq shouldBe
      PipelineOps.bpeTrainCore(words).collect().map(_.toString).toSeq
    // and on the real corpus vocabulary (schema parity included)
    val vocab = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("text")), "\\s+")).as("w"))
      .groupBy("w").count().withColumnRenamed("count", "wc")
    val local = PipelineOps.bpeTrainLocal(vocab)
    val dist = PipelineOps.bpeTrainCore(vocab)
    local.schema shouldBe dist.schema
    local.collect().map(_.toString).toSeq shouldBe
      dist.collect().map(_.toString).toSeq
  }

  test("training on the corpus is deterministic and counts are non-increasing") {
    val a = PipelineOps.bpeTrain(spark, sfDir).collect()
    val b = PipelineOps.bpeTrain(spark, sfDir).collect()
    a.map(_.toString) shouldBe b.map(_.toString)
    a.length shouldBe PipelineOps.BpeMerges
    val counts = a.map(_.getAs[Long]("pair_count"))
    // each merge removes its pair from the pool; later argmaxes can't
    // exceed an earlier one except via symbols the merge itself created —
    // which are substrings of it, still bounded by its count
    counts.zip(counts.tail).foreach { case (x, y) => y should be <= x }
  }

  test("encoding with the trained merges compresses and accounts exactly") {
    val rows = PipelineOps.bpeEncode(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val chars = r.getAs[Long]("n_word_chars")
      val toks = r.getAs[Long]("n_bpe_tokens")
      // every merge application reduces the symbol count by exactly one,
      // so tokens ∈ [chars - merges_applied, chars] and never below words
      toks should be <= chars
      toks should be >= r.getAs[Long]("n_words")
      r.getAs[Double]("chars_per_token") should be >= 1.0
    }
  }
}
