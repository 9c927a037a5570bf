package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the deletion-neighborhood sidecar (`dictdel/` — the
  * SymSpell symmetric-delete discipline behind fuzzy expansion):
  *  - the containment THEOREM (lev(w,q) ≤ d ⇒ deletes(w,d) ∩
  *    deletes(q,d) ≠ ∅) property-tested over seeded random pairs, since
  *    the whole access path is sound only because of it;
  *  - path equivalence: the neighborhood join and the length-band scan
  *    produce the identical (w, dist) expansion on corpus typos AND
  *    seeded random queries (q_bm25_fuzzy's oracle stays unchanged by
  *    construction);
  *  - the restriction claim: the neighborhood prefilter reads strictly
  *    fewer candidate rows than the length band holds;
  *  - lifecycle: upsert-introduced terms become fuzzy-findable, vacuum-
  *    removed terms leave the sidecar, and del_matches_dict flags a
  *    planted shard drop until rebuildDerived restores it. */
class DictDelSpec extends SparkSpecBase with Matchers {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deleteVariants is the exact ≤d-deletion set") {
    InvertedIndex.deleteVariants("abc", 1).toSet shouldBe
      Set("abc", "bc", "ac", "ab")
    InvertedIndex.deleteVariants("abc", 2).toSet shouldBe
      Set("abc", "bc", "ac", "ab", "a", "b", "c")
    InvertedIndex.deleteVariants("", 2) shouldBe Seq("")
    InvertedIndex.deleteVariants("ab", 0) shouldBe Seq("ab")
  }

  test("containment theorem: lev(w,q) <= d implies a shared deletion variant (seeded random pairs)") {
    val rnd = new scala.util.Random(171717)
    def randWord(): String =
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString // tiny alphabet → plenty of close pairs
    var closePairs = 0
    (1 to 3000).foreach { _ =>
      val (w, q) = (randWord(), randWord())
      val d = lev(w, q)
      if (d <= InvertedIndex.MaxDeletes) {
        closePairs += 1
        val shared = InvertedIndex.deleteVariants(w, d).toSet
          .intersect(InvertedIndex.deleteVariants(q, d).toSet)
        withClue(s"w='$w' q='$q' d=$d: ") { shared should not be empty }
      }
    }
    closePairs should be > 100 // the property was actually exercised
  }

  test("neighborhood join equals the length-band scan on corpus typos and random queries") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val rnd = new scala.util.Random(2468)
    val corpusish = Seq("grup", "vectr", "hsh", "qery", "strem", "windw",
      "mrge", "srt", "vector", "as", "x")
    val random = (1 to 10).map(_ =>
      (0 until (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString)
    (corpusish ++ random).foreach { q =>
      (1 to InvertedIndex.MaxDeletes).foreach { d =>
        val nb = InvertedIndex.fuzzyCandidates(spark, layout, q, d)
          .collect().map(r => (r.getString(0), r.getInt(1))).toSet
        val band = InvertedIndex.fuzzyBandCandidates(spark, layout, q, d)
          .collect().map(r => (r.getString(0), r.getInt(1))).toSet
        withClue(s"q='$q' d=$d: ") { nb shouldBe band }
      }
    }
  }

  test("the neighborhood prefilter reads fewer candidates than the length band holds") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val q = InvertedIndex.FuzzyQ
    val d = InvertedIndex.FuzzyMaxEdits
    val variants = InvertedIndex.deleteVariants(q, d)
    val vbuckets = variants.map(InvertedIndex.bucketOf).distinct
    val candidateTerms = spark.read
      .parquet(InvertedIndex.dictDelPathOf(layout))
      .filter(col("vbucket").isin(vbuckets: _*) &&
        col("v").isin(variants: _*))
      .select(col("w")).distinct().count()
    val bandTerms = spark.read
      .parquet(InvertedIndex.dictLexPathOf(layout))
      .filter(col("len").between(q.length - d, q.length + d)).count()
    candidateTerms should be < bandTerms
    candidateTerms should be > 0L
  }

  test("lifecycle: upserted terms become fuzzy-findable, vacuumed terms leave, audit stays zero") {
    import spark.implicits._
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "dictdel-life")
    def auditMap(): Map[String, Long] =
      InvertedIndex.auditFrame(spark, layout).collect()
        .map(r => (r.getString(1), r.getLong(2))).toMap
    // a term the corpus does not contain, reachable from the typo at 1 edit
    val freshId = InvertedIndex.UpsertIdOffset + 777
    InvertedIndex.upsertDocs(spark, layout,
      Seq((freshId, "zzyzzx appears here")).toDF("doc_id", "text"))
    InvertedIndex.expandFuzzy(spark, layout, "zzyzz", 1)
      .map(_._1) should contain("zzyzzx")
    auditMap()("del_matches_dict") shouldBe 0L
    // delete the doc and fold: the term's variants must leave the sidecar
    InvertedIndex.deleteDocs(spark, layout, Seq(freshId).toDF("doc_id"))
    InvertedIndex.vacuum(spark, layout)
    InvertedIndex.expandFuzzy(spark, layout, "zzyzz", 1)
      .map(_._1) should not contain "zzyzzx"
    spark.read.parquet(InvertedIndex.dictDelPathOf(layout))
      .filter(col("w") === "zzyzzx").count() shouldBe 0L
    auditMap()("del_matches_dict") shouldBe 0L
  }

  test("a dropped vbucket shard flags del_matches_dict; rebuildDerived restores it") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "dictdel-repair")
    val delPath = Paths.get(InvertedIndex.dictDelPathOf(layout))
    val first = {
      val s = Files.list(delPath)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_))
          .toSeq.minBy(_.getFileName.toString)
      } finally s.close()
    }
    Maintenance.deleteRecursively(first)
    def audit(): Long =
      InvertedIndex.auditFrame(spark, layout).collect()
        .map(r => (r.getString(1), r.getLong(2))).toMap
        .apply("del_matches_dict")
    audit() should be > 0L
    InvertedIndex.rebuildDerived(spark, layout)
    audit() shouldBe 0L
    // and the expansion serves correctly again through the restored path
    val got = InvertedIndex.expandFuzzy(
      spark, layout, InvertedIndex.FuzzyQ, InvertedIndex.FuzzyMaxEdits)
    got should not be empty
  }
}
