package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

class CorpusOpsSpec extends SparkSpecBase with Matchers {

  private def docsDf(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(java.util.Arrays.asList(
      rows.map { case (i, t) => Row(i, t, "en", "src0", t.length.toLong) }: _*), schema)
  }

  test("repetition metrics match hand-computed values") {
    // "a a a b": 4 tokens, 2 distinct -> dup 0.5;
    // bigrams [a a, a a, a b]: top 'a a'=2 of 3
    val r = CorpusOps.repetition(spark, sfDir)
    val all = r.collect()
    all.length shouldBe Tables.documents(spark, sfDir).count()
    all.foreach { row =>
      row.getDouble(2) should (be >= 0.0 and be <= 1.0)
      if (!row.isNullAt(3)) row.getDouble(3) should (be > 0.0 and be <= 1.0)
    }
    // hand-computed on a tiny corpus, through the production core
    val tiny = docsDf((1L, "a a a b"), (2L, "x y"))
    val byId = CorpusOpsTestHook.repetitionOf(spark, tiny).collect()
      .map(r2 => r2.getLong(0) -> r2).toMap
    byId(1L).getInt(1) shouldBe 4
    byId(1L).getDouble(2) shouldBe 0.5 +- 1e-9
    byId(1L).getDouble(3) shouldBe (2.0 / 3.0) +- 1e-6
    byId(2L).getDouble(2) shouldBe 0.0 +- 1e-9
    byId(2L).getDouble(3) shouldBe 1.0 +- 1e-9
  }

  test("decontamination flags exactly the docs sharing a 3-gram with the benchmark split") {
    val res = CorpusOps.decontaminate(spark, sfDir).collect()
    // no benchmark doc may appear in the output
    all(res.map(_.getLong(0) % 97)) should not be 0L
    all(res.map(_.getLong(1))) should be > 0L
    // brute-force cross-check on the real corpus
    val docs = Tables.documents(spark, sfDir)
    val grams = docs.select(col("doc_id"), explode(Dedup.shingles3(col("text"))).as("g"))
    val bench = grams.filter(col("doc_id") % 97 === 0).select("g").distinct()
      .collect().map(_.getString(0)).toSet
    val expect = grams.filter(col("doc_id") % 97 =!= 0).collect()
      .filter(r => bench.contains(r.getString(1)))
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(1)).distinct.length }
    res.map(r => r.getLong(0) -> r.getLong(1).toInt).toMap shouldBe expect
  }

  test("PII redaction: planted emails/phones are counted and absent from redacted text") {
    val res = CorpusOps.piiRedact(spark, sfDir).collect()
    res.foreach { r =>
      val id = r.getLong(0)
      r.getInt(1) shouldBe (if (id % 7 == 0) 1 else 0)
      r.getInt(2) shouldBe (if (id % 11 == 0) 1 else 0)
      r.getString(3) should not include "@example.com"
      r.getString(3) should not include "555-0"
    }
  }

  test("source mixing is deterministic, per-tier weighted, and within binomial bounds") {
    val a = CorpusOps.mixSources(spark, sfDir).collect()
    val b = CorpusOps.mixSources(spark, sfDir).collect()
    a.map(_.toString) shouldBe b.map(_.toString) // no RNG anywhere
    a.foreach { r =>
      val w = r.getInt(1); val total = r.getLong(2); val kept = r.getLong(3)
      val expected = total * w / 100.0
      // 25 docs/source at sf0.01: allow 4-sigma binomial slack
      val sigma = math.sqrt(total * (w / 100.0) * (1 - w / 100.0))
      math.abs(kept - expected) should be <= (4 * sigma + 1)
    }
  }

  test("train/val/test split partitions the corpus deterministically near 80/10/10") {
    val total = graft.Tables.documents(spark, sfDir).count()
    val a = CorpusOps.trainValTestSplit(spark, sfDir).collect()
    val b = CorpusOps.trainValTestSplit(spark, sfDir).collect()
    a.map(_.toString) shouldBe b.map(_.toString) // pure function of doc_id
    a.map(_.getAs[Long]("n_docs")).sum shouldBe total // a partition, no loss
    val byName = a.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    // hash-uniformity: 4-sigma binomial slack around each target share
    Seq("train" -> 0.80, "val" -> 0.10, "test" -> 0.10).foreach { case (s, p) =>
      val sigma = math.sqrt(total * p * (1 - p))
      math.abs(byName(s) - total * p) should be <= (4 * sigma + 1)
    }
  }

  test("source cap keeps min(cap, source size) docs and the longest ones") {
    val perSource = graft.Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val capped = CorpusOps.sourceCap(spark, sfDir).collect()
    capped.map(_.getString(0)).toSet shouldBe perSource.keySet // no source dropped
    capped.foreach { r =>
      val src = r.getString(0)
      r.getAs[Long]("n_kept") shouldBe math.min(CorpusOps.SourceCap.toLong, perSource(src))
      // threshold consistency: everything longer than the cut was kept
      val above = graft.Tables.documents(spark, sfDir)
        .filter(col("source") === src &&
          col("n_chars") > r.getAs[Long]("min_chars_kept"))
        .count()
      above should be <= r.getAs[Long]("n_kept")
    }
  }

  test("gopher rules: each planted violator fails exactly its own rule") {
    val tmp = java.nio.file.Files.createTempDirectory("gopher").toString
    val good = "the a " + (1 to 20).map(i => s"word$i").mkString(" ")
    val tooShort = "the a tiny" // 3 words
    val tinyWords = "the a " + ('b' to 's').mkString(" ") // mean word length 1.2
    val spammy = "the a " + Seq.fill(20)("spam").mkString(" ") // dup_frac 19/22
    val noStops = (1 to 15).map(i => s"word$i").mkString(" ")
    docsDf(1L -> good, 2L -> tooShort, 3L -> tinyWords, 4L -> spammy, 5L -> noStops)
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val rows = CorpusOps.gopherRules(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = {
      val r = rows(id)
      (r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9))
    }
    flags(1L) shouldBe ((1, 1, 1, 1, 1)) // keep
    flags(2L) shouldBe ((0, 1, 1, 1, 0)) // word count
    flags(3L) shouldBe ((1, 0, 1, 1, 0)) // mean word length
    flags(4L) shouldBe ((1, 1, 1, 0, 0)) // duplicate-token fraction
    flags(5L) shouldBe ((1, 1, 0, 1, 0)) // stopwords
  }

  test("temperature mix: smallest language keeps everything, bigger ones flatten by sqrt") {
    val tmp = java.nio.file.Files.createTempDirectory("tempmix").toString
    // langs sized 4 / 16 / 64: rates 1.0 / 0.5 / 0.25
    val rows = (1 to 4).map(i => (i.toLong, "aa")) ++
      (5 to 20).map(i => (i.toLong, "bb")) ++
      (21 to 84).map(i => (i.toLong, "cc"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(java.util.Arrays.asList(
      rows.map { case (i, l) => Row(i, "x", l, "src0", 1L) }: _*), schema)
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val out = CorpusOps.temperatureMix(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    out("aa")._2 shouldBe 1.0
    out("bb")._2 shouldBe 0.5
    out("cc")._2 shouldBe 0.25
    out("aa")._3 shouldBe 4L // rate 1.0 is a tautological gate: all kept
    // hash-gated keeps stay within loose binomial bounds of rate·n
    out("bb")._3.toDouble should (be >= 2.0 and be <= 14.0)
    out("cc")._3.toDouble should (be >= 6.0 and be <= 26.0)
    // deterministic: re-run bit-identical
    CorpusOps.temperatureMix(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap shouldBe out
  }

  test("quality gate thresholds each source at its own exact P25") {
    val tmp = java.nio.file.Files.createTempDirectory("qgate").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      (1L, "s1", 10L), (2L, "s1", 20L), (3L, "s1", 30L), (4L, "s1", 40L),
      (5L, "s2", 5L), (6L, "s2", 5L), (7L, "s2", 5L), (8L, "s2", 5L))
    spark.createDataFrame(java.util.Arrays.asList(
      rows.map { case (i, s, n) => Row(i, "x", "en", s, n) }: _*), schema)
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val out = CorpusOps.qualityGate(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // interpolated P25 of [10,20,30,40] = 17.5 → 20/30/40 pass, 10 drops;
    // a constant source keeps everything (thr = the constant)
    out("s1") shouldBe ((17.5, 3L, 1L))
    out("s2") shouldBe ((5.0, 4L, 0L))
  }

  test("k-anonymity ladder: release, generalize, and suppress branches") {
    import spark.implicits._
    val groups = Seq(
      ("en", "a", 10L),                 // ≥ k → released as-is
      ("en", "b", 3L), ("en", "c", 6L), // en residual 9 ≥ k → generalized
      ("fr", "d", 2L), ("fr", "e", 3L), // fr residual 5 < k → suppressed
      ("de", "f", 1L)                   // de residual 1 < k → suppressed
    ).toDF("lang", "source", "n")
    val out = CorpusOps.kAnonymize(groups, 8).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    out shouldBe Array(("*", "*", 6L), ("en", "*", 9L), ("en", "a", 10L))
  }

  test("k-anonymity on the corpus: no identifiable group under k, total preserved") {
    val out = CorpusOps.kAnonymity(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // every non-suppressed row satisfies the floor
    out.filter(r => r._1 != "*").foreach(r =>
      r._3 should be >= CorpusOps.AnonK.toLong)
    // accounting preserves the corpus: released + generalized + suppressed
    out.map(_._3).sum shouldBe graft.Tables.documents(spark, sfDir).count()
  }

  test("weighted sample: no replacement, deterministic, and weight-skewed toward heavy docs") {
    import org.apache.spark.sql.functions._
    val a = CorpusOps.weightedSample(spark, sfDir).collect()
    val b = CorpusOps.weightedSample(spark, sfDir).collect()
    a.map(_.getLong(0)) shouldBe b.map(_.getLong(0)) // deterministic draw
    a.map(_.getLong(0)).distinct.length shouldBe a.length // without replacement
    a.length shouldBe CorpusOps.WeightedSampleN
    // inclusion ∝ weight (chars): the weighted sample's mean doc length
    // must exceed the corpus mean by a clear margin
    val sampleMean = a.map(_.getLong(1)).sum.toDouble / a.length
    val corpusMean = graft.Tables.documents(spark, sfDir)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    sampleMean should be > corpusMean * 1.1
  }
}

/** Exposes the repetition core over an arbitrary docs frame so the
  * hand-computed test drives the production pipeline, not a copy. */
object CorpusOpsTestHook {
  def repetitionOf(spark: org.apache.spark.sql.SparkSession,
                   docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // CorpusOps.repetition reads via Tables.documents(dir) — round-trip
    // the frame through a temp parquet dir so the test drives the
    // production operator, not a re-implementation.
    val tmp = java.nio.file.Files.createTempDirectory("corpus-hook").toString
    docs.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    CorpusOps.repetition(spark, tmp)
  }
}
