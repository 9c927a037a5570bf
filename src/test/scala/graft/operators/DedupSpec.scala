package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class DedupSpec extends SparkSpecBase with Matchers {

  lazy val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  test("cluster resolution: transitive chains collapse to one component, lowest id survives") {
    import spark.implicits._
    // A-B, B-C transitively one cluster; D-E separate; long path 10..14
    // exercises multi-round convergence (diameter 4 > 1 propagation round)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), // chain
      (7L, 8L), // pair
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L) // path, diameter 4
    ).toDF("doc_a", "doc_b")
    val rep = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rep(1L) shouldBe 1L
    rep(2L) shouldBe 1L
    rep(3L) shouldBe 1L
    rep(7L) shouldBe 7L
    rep(8L) shouldBe 7L
    (10L to 14L).foreach(d => rep(d) shouldBe 10L)
    // exactly one survivor per component
    rep.groupBy(_._2).foreach { case (c, members) =>
      members.keys.count(_ == c) shouldBe 1
    }
  }

  test("exact dedup keeps the lowest id per duplicate group and is idempotent") {
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val once = Dedup.exact(doubled)
    once.count() shouldBe docs.count()
    once.agg(max(col("doc_id"))).head().getLong(0) should be < 100000L
    // Idempotence: dedup of the deduped set changes nothing.
    Dedup.exact(once.drop("fp")).count() shouldBe once.count()
  }

  test("dedup result is invariant under input row order") {
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val a = Dedup.exact(doubled).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Dedup.exact(doubled.orderBy(rand(42))).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    a shouldBe b
  }

  test("ngram Jaccard finds the planted near-duplicates and only near-identical pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, 0.8).collect()
    pairs.length should be > 0
    all(pairs.map(_.getDouble(2))) should be >= 0.8
    // identical docs → jaccard exactly 1
    val selfPair = Dedup.ngramJaccardPairs(
      docs.limit(1).unionByName(docs.limit(1)
        .select((col("doc_id") + 1).as("doc_id"), col("text"))), 0.99).collect()
    selfPair.length shouldBe 1
    selfPair.head.getDouble(2) shouldBe 1.0
  }

  test("minhash LSH candidates cover every true >=0.9-Jaccard pair (recall on planted dups)") {
    val truePairs = Dedup.ngramJaccardPairs(docs, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Dedup.minhashLshPairs(docs, 0.0)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    truePairs.diff(lshPairs) shouldBe empty
  }

  test("minhash estimator is non-degenerate: mid-similarity pairs estimate between 0 and 1") {
    // Regression for a reviewed bug: with a modulus larger than the base
    // hash the 16 "hash functions" were all monotone in one value and the
    // estimate collapsed to exactly 0 or 1. Two docs sharing roughly half
    // their shingles must estimate strictly inside (0, 1).
    import org.apache.spark.sql.types._
    val shared = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d1 = shared + " " + (1 to 40).map(i => s"left$i").mkString(" ")
    val d2 = shared + " " + (1 to 40).map(i => s"right$i").mkString(" ")
    val docs2 = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, d1), org.apache.spark.sql.Row(2L, d2)),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val est = Dedup.minhashLshPairs(docs2, 0.0).collect()
    est.length shouldBe 1
    est.head.getDouble(2) should (be > 0.05 and be < 0.95)
  }

  test("native shingle tokenization equals SQL trim+split semantics on whitespace-edged text") {
    // Regression for a reviewed parity seam: Java String.trim strips
    // \t\n\r (SQL trim strips spaces only) and Java split drops trailing
    // empty tokens (DuckDB's RE2 split keeps them). The kernel must
    // tokenize EXACTLY like Spark's own split(trim(text)) — which matches
    // the DuckDB oracle CTEs — on every input, including these edges.
    import org.apache.spark.sql.types._
    val edgy = Seq("\ta b c", "a b\t", "  x y  ", "", "\t", "a\nb c\r")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(edgy.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(i.toLong, t) }: _*),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val toks = split(trim(col("text")), "\\s+")
    val nToks = org.apache.spark.sql.functions.size(toks)
    val refBigrams = zip_with(
      slice(toks, lit(1), greatest(nToks - 1, lit(0))),
      slice(toks, lit(2), greatest(nToks - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val rows = df.select(col("doc_id"),
      Dedup.ngramStream(col("text"), 2).as("kernel"),
      when(nToks >= 2, refBigrams).otherwise(array().cast("array<string>")).as("ref"))
      .collect()
    rows.foreach { r =>
      withClue(s"doc ${r.getLong(0)} (${edgy(r.getLong(0).toInt).replace("\t", "\\t")}): ")(
        r.getSeq[String](1) shouldBe r.getSeq[String](2))
    }
  }

  test("gated near-dup equals the unguarded exact Jaccard on the planted corpus, minus the gram self-join") {
    val gated = Dedup.nearDupPairs(docs, 0.8, 0.5)
    val exact = Dedup.ngramJaccardPairs(docs, 0.8)
    val g = gated.collect().map(_.toString).sorted
    val e = exact.collect().map(_.toString).sorted
    // identical pairs AND identical exact-Jaccard values: the LSH gate
    // lost nothing on this corpus, and verification is the true metric,
    // not the signature estimate
    g shouldBe e
    // the plan must contain no corpus-wide gram self-join: xxhash64 is
    // the raw inverted-index join key and appears ONLY in that plan
    gated.queryExecution.executedPlan.toString should not include "xxhash64"
    Dedup.ngramJaccardPairs(docs, 0.8)
      .queryExecution.executedPlan.toString should include("xxhash64")
  }

  test("simhash banded pairs equal the brute-force hamming scan (pigeonhole losslessness)") {
    val banded = Dedup.simhashPairs(docs, 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashSignatures(docs)
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    banded shouldBe brute
  }

  test("cross-corpus duplicated-gram fraction matches hand-computed values") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dupfrac").toString
    // X and Y identical (both grams shared) -> 1.0; W shares exactly one
    // of its two grams with X/Y -> 0.5; Z shares nothing -> 0.0
    Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma zetax"),
      (4L, "pqq rqq sqq tqq"))
      .toDF("doc_id", "text").write.parquet(tmp + "/documents.parquet")
    val out = DedupOps.dupGramFrac(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out(1L) shouldBe ((2L, 2L, 1.0))
    out(2L) shouldBe ((2L, 2L, 1.0))
    out(3L) shouldBe ((2L, 1L, 0.5))
    out(4L) shouldBe ((2L, 0L, 0.0))
  }

  test("embedding near-dup pairs are symmetric-unique and above threshold") {
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, sfDir))
    val pairs = Dedup.embeddingNearDupPairs(emb, 0.3).collect()
    pairs.length should be > 0
    all(pairs.map(_.getDouble(3))) should be >= 0.3
    val keys = pairs.map(r => (r.getLong(1), r.getLong(2)))
    keys.distinct.length shouldBe keys.length
    all(keys.map { case (a, b) => a < b }) shouldBe true
  }

  test("source overlap matrix equals a set-algebra referee over per-source shingle vocabularies") {
    val out = DedupOps.sourceOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // referee: per-source distinct 3-gram sets computed in plain Scala
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // mirror the documented kernel contract exactly: SQL space-only trim
    // (not Java's trim, which also strips control chars) and split with
    // limit -1 (trailing empty tokens kept, as DuckDB's RE2 split keeps
    // them) — see WordNGramShingles.sqlTrim
    def sqlTrim(s: String): String =
      s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val vocab = docs.groupBy(_._1).map { case (src, rows) =>
      src -> rows.flatMap { case (_, text) =>
        val tt = sqlTrim(text)
        val t = tt.split("\\s+", -1).toSeq
        if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq
        else Seq(tt)
      }.toSet
    }
    val expected = (for {
      (a, va) <- vocab; (b, vb) <- vocab if a < b
      i = (va intersect vb).size if i > 0
    } yield (a, b) -> ((i.toLong,
      BigDecimal(i.toDouble / (va.size + vb.size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    out shouldBe expected
    assert(out.nonEmpty, "the shared vocabulary guarantees cross-source gram overlap")
  }

  test("duplicate spans: a stolen passage is cut-listed in both docs, intra-doc repeats split") {
    import spark.implicits._
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")     // 12 shared tokens
    val docs = Seq(
      (1L, passage),                                            // the source doc
      (2L, (1 to 5).map(i => s"u$i").mkString(" ") + " " + passage +
        " " + (1 to 5).map(i => s"v$i").mkString(" ")),         // passage embedded at offset 5
      (3L, ((1 to 8).map(i => s"w$i") ++ Seq("x") ++
        (1 to 8).map(i => s"w$i")).mkString(" ")),              // intra-doc repeat, gap 9
      (4L, (1 to 20).map(i => s"z$i").mkString(" "))            // unique — no rows
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: whole doc is the shared passage → span [0,11], 5 grams (12-8+1)
    // doc 2: passage sits at tokens [5,16] → one merged span, same 5 grams
    // doc 3: the repeated 8-token run appears at [0,7] and [9,16]; the gap
    //        (9 > SpanGram) keeps them separate islands, 1 gram each
    out shouldBe Array(
      (1L, 0L, 11L, 12L, 5L),
      (2L, 5L, 16L, 12L, 5L),
      (3L, 0L, 7L, 8L, 1L),
      (3L, 9L, 16L, 8L, 1L))
    // and applying the cut lists removes exactly those spans: the fully-
    // duplicated doc empties, the host doc keeps its unique frame, the
    // intra-doc repeat leaves only the separator, the unique doc is
    // untouched
    val cut = Dedup.applyCuts(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    cut(1L) shouldBe ((12L, 12L, ""))
    cut(2L) shouldBe ((22L, 12L,
      (1 to 5).map(i => s"u$i").mkString(" ") + " " +
        (1 to 5).map(i => s"v$i").mkString(" ")))
    cut(3L) shouldBe ((17L, 16L, "x"))
    cut(4L) shouldBe ((20L, 0L, (1 to 20).map(i => s"z$i").mkString(" ")))
  }
}
