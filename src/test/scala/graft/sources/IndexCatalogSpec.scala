package graft.sources

import graft.{SparkSpecBase, Tables}
import graft.sources.IndexCatalog.IndexDescriptor
import org.scalatest.matchers.should.Matchers

class IndexCatalogSpec extends SparkSpecBase with Matchers {

  test("index DDL: create-if-absent is idempotent; list + stats reflect the build") {
    val base = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val emb = Tables.embeddings(spark, sfDir)
    val desc = IndexDescriptor("whatsapp-chat", 64, "cosine")

    IndexCatalog.exists(base, "whatsapp-chat") shouldBe false
    IndexCatalog.createIfAbsent(spark, base, desc, emb) shouldBe true
    // second create is a no-op, like the reference's GET-then-POST
    // (upsert/upsert.go:38-111)
    IndexCatalog.createIfAbsent(spark, base, desc, emb.limit(1)) shouldBe false

    IndexCatalog.list(base) shouldBe Seq("whatsapp-chat")
    IndexCatalog.describe(base, "whatsapp-chat") shouldBe Some(desc)
    IndexCatalog.describe(base, "missing") shouldBe None
    val loaded = IndexCatalog.load(spark, base, "whatsapp-chat")
    loaded.count() shouldBe emb.count()
    loaded.columns should contain("vec_norm")

    val stats = IndexCatalog.describeStats(spark, base, "whatsapp-chat").collect()
    stats.map(_.getLong(1)).sum shouldBe emb.count()
  }

  test("search honors the metric stored in the index descriptor") {
    val base = java.nio.file.Files.createTempDirectory("graft-catalog3").toString
    val emb = Tables.embeddings(spark, sfDir)
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("l2-index", 64, "euclidean"), emb)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select(org.apache.spark.sql.functions.col("vec_id").as("q_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_embedding"))
    val res = IndexCatalog.search(spark, base, "l2-index", q, 5).collect()
    res.length shouldBe 5
    // euclidean: scores are DISTANCES, ascending — proof the descriptor's
    // metric (not a caller default) drove the search
    val d = res.map(_.getDouble(2))
    d.sorted shouldBe d
    an[IllegalArgumentException] should be thrownBy
      IndexCatalog.search(spark, base, "missing", q, 5)
  }

  test("namespace (label) filter prunes to partition directories") {
    val base = java.nio.file.Files.createTempDirectory("graft-catalog2").toString
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("ns-test", 64, "cosine"), Tables.embeddings(spark, sfDir))
    val one = IndexCatalog.load(spark, base, "ns-test")
      .filter(org.apache.spark.sql.functions.col("label") === 3)
    val plan = one.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(label")
    one.count() should be > 0L
  }
}
