package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Gates for the index-fleet self-audit (q_index_audit): all-zeros on the
  * healthy cache, and SENSITIVE — a planted corruption flags exactly its
  * invariant and no other (an audit that can't fail is decoration). */
class IndexAuditSpec extends SparkSpecBase with Matchers {

  private def firstPartitionDir(root: String): java.nio.file.Path = {
    val s = Files.list(Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isDirectory(_))
        .toSeq.minBy(_.getFileName.toString)
    } finally s.close()
  }

  private def auditMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => (r.getString(1), r.getLong(2))).toMap

  test("q_index_audit is all-zeros on the healthy shared cache") {
    val rows = MinhashIndex.indexAudit(spark, sfDir).collect()
    rows should have length 11
    rows.map(_.getLong(2)).toSeq shouldBe Seq.fill(11)(0L)
  }

  test("a planted keymap drift flags exactly keymap_mirrors_data") {
    import spark.implicits._
    import graft.sources.IndexCatalog.IndexDescriptor
    val base = Files.createTempDirectory("graft-audit-km").toString
    val data = Seq(
      (1L, Array(1f, 0f), 0, 0L),
      (2L, Array(0f, 1f), 0, 1L)
    ).toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("akm", 2, "cosine"), data,
      partitionCols = Seq("bucket")) shouldBe true
    IndexCatalog.ensureKeymap(spark, base, "akm", "vec_id")
    auditMap(IndexCatalog.auditFrame(spark, base, "akm"))
      .values.foreach(_ shouldBe 0L)
    // plant a phantom location — the standing surplus only a crash
    // window may leave transiently
    val b9 = spark.range(1)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.lit(9L)),
        org.apache.spark.sql.functions.lit(64L))).head().getLong(0)
    Seq((9L, "3")).toDF("vec_id", "bucket")
      .coalesce(1).write.mode("append")
      .parquet(Paths.get(base, "akm", "keymap", s"kbucket=$b9").toString)
    val audit = auditMap(IndexCatalog.auditFrame(spark, base, "akm"))
    audit("keymap_mirrors_data") shouldBe 1L
    (audit - "keymap_mirrors_data").values.foreach(_ shouldBe 0L)
  }

  test("a planted dict corruption flags exactly dict_df_matches_postings") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "audit-dict")
    Maintenance.deleteRecursively(firstPartitionDir(layout.dictPath))
    val audit = auditMap(InvertedIndex.auditFrame(spark, layout))
    audit("dict_df_matches_postings") should be > 0L
    (audit - "dict_df_matches_postings").values.foreach(_ shouldBe 0L)
  }

  test("a planted positional truncation flags exactly positions_match_tf") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "audit-pos")
    val posRoot = Paths.get(layout.dataPath).getParent.resolve("positions")
    Maintenance.deleteRecursively(firstPartitionDir(posRoot.toString))
    val audit = auditMap(InvertedIndex.auditFrame(spark, layout))
    audit("positions_match_tf") should be > 0L
    (audit - "positions_match_tf").values.foreach(_ shouldBe 0L)
  }

  test("rebuildDerived is idempotent on a healthy index and refuses pending deletes") {
    import spark.implicits._
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "repair-idem")
    InvertedIndex.rebuildDerived(spark, layout)
    auditMap(InvertedIndex.auditFrame(spark, layout)).values.foreach(_ shouldBe 0L)
    // a second repair changes nothing either
    InvertedIndex.rebuildDerived(spark, layout)
    auditMap(InvertedIndex.auditFrame(spark, layout)).values.foreach(_ shouldBe 0L)
    // with pending deletes, repair refuses: stats were decremented at
    // delete time while postings still hold the dead rows — a rebuild
    // from postings would resurrect the deleted docs' counts
    InvertedIndex.deleteDocs(spark, layout, Seq(0L).toDF("doc_id"))
    val err = intercept[IllegalArgumentException] {
      InvertedIndex.rebuildDerived(spark, layout)
    }
    err.getMessage should include("vacuum before repair")
  }

  test("a planted band-store drift flags exactly bands_match_sigs") {
    val layout = MinhashIndex.cloneIndex(spark, sfDir, "audit-bands")
    Maintenance.deleteRecursively(firstPartitionDir(layout.bandsPath))
    val audit = auditMap(MinhashIndex.auditFrame(spark, layout))
    audit("bands_match_sigs") should be > 0L
    audit("sig_width") shouldBe 0L
  }
}
