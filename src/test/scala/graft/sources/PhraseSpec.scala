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

  /** From-scratch proximity pair counts — the referee for the slop form
    * (gap-window join over raw tokenization). */
  private def naiveProx(docs: DataFrame, w1: String, w2: String,
                        slop: Int): Seq[(Long, Long)] = {
    val pos = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
    val a = pos.filter(col("w") === w1).select(col("doc_id"), col("pos").as("p1"))
    val b = pos.filter(col("w") === w2).select(col("doc_id"), col("pos").as("p2"))
    a.join(b, a("doc_id") === b("doc_id") &&
        col("p2") - col("p1") >= 1L && col("p2") - col("p1") <= (slop + 1).toLong)
      .groupBy(a("doc_id").as("doc_id")).agg(count(lit(1)).as("prox_tf"))
      .orderBy(col("prox_tf").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("q_phrase_slop equals the from-raw-text gap-window recompute; slop 0 degenerates to the exact phrase") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    val got = InvertedIndex.phraseSlop(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe naiveProx(docs, InvertedIndex.PhraseW1,
      InvertedIndex.PhraseW2, InvertedIndex.PhraseSlop)
    got should not be empty
    // widening the window can only add matches (monotone in slop) —
    // and at this corpus it strictly does, or the slop arm is vacuous
    got.toMap.values.sum should be >= served(layout).toMap.values.sum
    // slop=0 is EXACTLY the phrase query
    InvertedIndex.proximityOver(spark, layout,
        InvertedIndex.PhraseW1, InvertedIndex.PhraseW2, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe served(layout)
  }

  test("proximity stays exact through upsert, pending tombstones, and vacuum") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "prox-lifecycle")
    val docs = graft.Tables.documents(spark, sfDir)
    val twins = docs.filter(col("doc_id") < InvertedIndex.UpsertSrcCount)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("text"))
    InvertedIndex.upsertDocs(spark, layout, twins)
    def servedProx() = InvertedIndex.proximityOver(spark, layout,
        InvertedIndex.PhraseW1, InvertedIndex.PhraseW2,
        InvertedIndex.PhraseSlop).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val grown = docs.select(col("doc_id"), col("text")).unionByName(twins)
    servedProx() shouldBe naiveProx(grown,
      InvertedIndex.PhraseW1, InvertedIndex.PhraseW2, InvertedIndex.PhraseSlop)
    val dead = docs.filter(col("doc_id") % 13 === 2).select(col("doc_id"))
    InvertedIndex.deleteDocs(spark, layout, dead)
    val reduced = grown.join(dead, Seq("doc_id"), "left_anti")
    servedProx() shouldBe naiveProx(reduced,
      InvertedIndex.PhraseW1, InvertedIndex.PhraseW2, InvertedIndex.PhraseSlop)
    InvertedIndex.vacuum(spark, layout)
    servedProx() shouldBe naiveProx(reduced,
      InvertedIndex.PhraseW1, InvertedIndex.PhraseW2, InvertedIndex.PhraseSlop)
  }

  test("q_bm25_bool: every served doc holds ALL must terms and no must-not term; scores ride the shared BM25 arithmetic") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val rows = InvertedIndex.bm25BoolIndexed(spark, sfDir).collect()
    rows should have length 10
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val toks = docs.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    rows.foreach { r =>
      val t = toks(r.getLong(0))
      InvertedIndex.BoolMust.foreach(w => assert(t.contains(w),
        s"doc ${r.getLong(0)} misses must term '$w'"))
      assert(!t.contains(InvertedIndex.BoolMustNot),
        s"doc ${r.getLong(0)} holds excluded term")
    }
    // the filter narrows WHO is scored, never the arithmetic: each
    // served score equals the flat two-term scorer's for the same doc
    val flat = InvertedIndex.bm25Over(spark, layout, k = Int.MaxValue,
        terms = InvertedIndex.BoolMust).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach(r => flat(r.getLong(0)) shouldBe r.getDouble(1))
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

  test("unordered slop: equals the bidirectional recompute, CONTAINS the ordered form, symmetric in word order") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    val (w1, w2, slop) =
      (InvertedIndex.PhraseW1, InvertedIndex.PhraseW2, InvertedIndex.PhraseSlop)
    // bidirectional referee from raw text
    val pos = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
    val a = pos.filter(col("w") === w1).select(col("doc_id"), col("pos").as("p1"))
    val b = pos.filter(col("w") === w2).select(col("doc_id"), col("pos").as("p2"))
    val expected = a.join(b, a("doc_id") === b("doc_id") &&
        abs(col("p2") - col("p1")) >= 1L &&
        abs(col("p2") - col("p1")) <= (slop + 1).toLong)
      .groupBy(a("doc_id").as("doc_id")).agg(count(lit(1)).as("prox_tf"))
      .orderBy(col("prox_tf").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    InvertedIndex.phraseSlopUnordered(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe expected
    // ordered ⊆ unordered per doc at full depth
    def full(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val un = full(InvertedIndex.proximityUnorderedOver(spark, layout, w1, w2, slop, k = 100000))
    val ord = full(InvertedIndex.proximityOver(spark, layout, w1, w2, slop, k = 100000))
    ord.foreach { case (d, c) => un(d) should be >= c }
    // transposition tolerance IS symmetry in the word order
    full(InvertedIndex.proximityUnorderedOver(spark, layout, w2, w1, slop, k = 100000)) shouldBe un
  }

  test("proximity-weighted bm25: the boost is exactly the gap-bucketed 1/g sum on top of plain bm25") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
    val (w1, w2, slop) =
      (InvertedIndex.PhraseW1, InvertedIndex.PhraseW2, InvertedIndex.PhraseSlop)
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bm = scores(InvertedIndex.bm25Over(spark, layout, k = 100000,
      terms = Seq(w1, w2)))
    val prox = scores(InvertedIndex.bm25ProxOver(spark, layout, w1, w2, slop,
      k = 100000))
    // per-gap pair counts from raw text
    val pos = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
    val a = pos.filter(col("w") === w1).select(col("doc_id"), col("pos").as("p1"))
    val b = pos.filter(col("w") === w2).select(col("doc_id"), col("pos").as("p2"))
    val gapCount = a.join(b, a("doc_id") === b("doc_id") &&
        col("p2") - col("p1") >= 1L && col("p2") - col("p1") <= (slop + 1).toLong)
      .select(a("doc_id").as("doc_id"), (col("p2") - col("p1")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    gapCount should not be empty // the boost arm is non-vacuous here
    prox.foreach { case (d, s) =>
      val boost = (1 to slop + 1)
        .map(g => gapCount.getOrElse((d, g.toLong), 0L).toDouble / g).sum
      s shouldBe (bm(d) + boost) +- 2e-6
    }
    // ranking actually moves: some boosted doc outranks a plain-bm25
    // superior, or the family is decoration at this corpus
    val topProx = prox.toSeq.sortBy { case (d, s) => (-s, d) }.take(10).map(_._1)
    val topBm = bm.toSeq.sortBy { case (d, s) => (-s, d) }.take(10).map(_._1)
    topProx should not be topBm
  }
}
