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
    rows should have length 8
    rows.map(_.getLong(2)).toSeq shouldBe Seq.fill(8)(0L)
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

  test("a planted band-store drift flags exactly bands_match_sigs") {
    val layout = MinhashIndex.cloneIndex(spark, sfDir, "audit-bands")
    Maintenance.deleteRecursively(firstPartitionDir(layout.bandsPath))
    val audit = auditMap(MinhashIndex.auditFrame(spark, layout))
    audit("bands_match_sigs") should be > 0L
    audit("sig_width") shouldBe 0L
  }
}
