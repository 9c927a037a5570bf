package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for exact phrase search over the positional sidecar
  * (InvertedIndex.phraseOver): indexed == from-raw-text recompute through
  * every maintenance state, and the access path partition-prunes. */
class PhraseSpec extends SparkSpecBase with Matchers {

  /** From-scratch phrase counts over a corpus frame — the referee the
    * positional store must equal (same adjacency-join arithmetic, raw
    * tokenization instead of the sidecar). */
  private def naive(docs: DataFrame, w1: String, w2: String): Seq[(Long, Long)] = {
    val pos = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
    val a = pos.filter(col("w") === w1).select(col("doc_id"), col("pos"))
    val b = pos.filter(col("w") === w2)
      .select(col("doc_id"), (col("pos") - 1L).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  private def served(layout: InvertedIndex.Layout): Seq[(Long, Long)] =
    InvertedIndex.phraseOver(spark, layout,
        Seq(InvertedIndex.PhraseW1, InvertedIndex.PhraseW2)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q_phrase equals the from-raw-text recompute and is non-empty") {
    val got = served(InvertedIndex.ensure(spark, sfDir))
    got shouldBe naive(graft.Tables.documents(spark, sfDir),
      InvertedIndex.PhraseW1, InvertedIndex.PhraseW2)
    got should not be empty
  }

  test("the phrase plan prunes to the two words' bucket directories") {
    val df = InvertedIndex.phraseIndexed(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[tbucket#\\d+ IN"
    // each branch's scan pushes both the IN and its own equality
    plan should include regex "In\\(w, \\[hash,vector\\]"
    plan should include ("EqualTo(w,vector)")
    plan should include ("EqualTo(w,hash)")
  }

  test("n-word generality: a 3-word phrase equals its from-raw-text recompute") {
    val docs = graft.Tables.documents(spark, sfDir)
    // derive the probe phrase from the data (doc 0's first three tokens),
    // so the test is corpus-independent and a match is guaranteed
    val words = docs.filter(col("doc_id") === 0L)
      .select(split(trim(col("text")), "\\s+")).head().getSeq[String](0).take(3)
    val layout = InvertedIndex.ensure(spark, sfDir)
    val got = InvertedIndex.phraseOver(spark, layout, words).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // naive: count window starts where all three tokens line up
    val pos = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
    val expected = words.zipWithIndex.map { case (w, i) =>
        pos.filter(col("w") === w)
          .select(col("doc_id"), (col("pos") - i.toLong).as("pos"))
      }
      .reduce((a, b) => a.join(b, Seq("doc_id", "pos")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe expected
    got.map(_._1) should contain (0L)
  }

  test("phrase stays exact through upsert, pending tombstones, and vacuum") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "phrase-lifecycle")
    val docs = graft.Tables.documents(spark, sfDir)
    val twins = docs.filter(col("doc_id") < InvertedIndex.UpsertSrcCount)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("text"))
    InvertedIndex.upsertDocs(spark, layout, twins)
    val grown = docs.select(col("doc_id"), col("text")).unionByName(twins)
    served(layout) shouldBe naive(grown,
      InvertedIndex.PhraseW1, InvertedIndex.PhraseW2)
    val dead = docs.filter(col("doc_id") % 13 === 2).select(col("doc_id"))
    InvertedIndex.deleteDocs(spark, layout, dead)
    val reduced = grown.join(dead, Seq("doc_id"), "left_anti")
    // tombstones pending: the read path masks dead docs' positions
    served(layout) shouldBe naive(reduced,
      InvertedIndex.PhraseW1, InvertedIndex.PhraseW2)
    // vacuum folds the positional store physically — same answer
    InvertedIndex.vacuum(spark, layout)
    served(layout) shouldBe naive(reduced,
      InvertedIndex.PhraseW1, InvertedIndex.PhraseW2)
  }
}
