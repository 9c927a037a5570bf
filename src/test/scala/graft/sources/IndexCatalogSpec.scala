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

  test("bucket-partitioned ANN index: probe search is PARTITION PRUNING, results unchanged") {
    import org.apache.spark.sql.functions.col
    import graft.operators.RandomHyperplaneLsh
    val base = java.nio.file.Files.createTempDirectory("graft-catalog-b").toString
    val data = Tables.embeddings(spark, sfDir)
      .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), 64))
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("lsh-bucketed", 64, "cosine"), data,
      partitionCols = Seq("label", "bucket")) shouldBe true

    // the bucket is a PHYSICAL directory level under each label
    val labelDir = java.nio.file.Paths.get(base, "lsh-bucketed", "data")
    val bucketDirs = java.nio.file.Files.walk(labelDir).iterator()
    var sawBucketDir = false
    while (bucketDirs.hasNext) {
      val p = bucketDirs.next().getFileName.toString
      if (p.startsWith("bucket=")) sawBucketDir = true
    }
    sawBucketDir shouldBe true

    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val qVec = q.head().getSeq[Float](1).toArray
    val qb = RandomHyperplaneLsh.bucketOf(qVec)

    val pruned = IndexCatalog.search(spark, base, "lsh-bucketed", q, 5, buckets = Seq(qb))
    val prunedRows = pruned.collect()
    // evidence, not prose: the probe restriction reaches the scan as a
    // PartitionFilter (the scan lists only the probed bucket= dirs)
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(pruned.queryExecution.executedPlan.toString)
      .map(_.group(1)).toSeq
    pf.exists(f => f.contains("bucket") && f.trim.nonEmpty) shouldBe true

    // pruning changes the access path, never the answer: equals the
    // unpruned search restricted to the same bucket in memory
    val full = IndexCatalog.load(spark, base, "lsh-bucketed")
      .filter(col("bucket") === qb.toInt)
    val brute = graft.operators.KnnSearch.topK(full, q, 5, "cosine", keep = Seq("bucket"))
    prunedRows.map(_.toString) shouldBe brute.collect().map(_.toString)

    // namespace-scoped stats prune to one label partition
    val stats = IndexCatalog.describeStats(spark, base, "lsh-bucketed", namespace = Some(3))
    val statRows = stats.collect()
    statRows.length shouldBe 1
    statRows.head.getInt(0) shouldBe 3
    val statPf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(stats.queryExecution.executedPlan.toString)
      .map(_.group(1)).toSeq
    statPf.exists(f => f.contains("label") && f.trim.nonEmpty) shouldBe true
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

  test("upsert that empties a partition deletes its stale directory") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert-empty").toString
    // bucket 7 holds EXACTLY one key; bucket 9 holds two
    val data = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0, 7L),
      (2L, Array(0f, 1f, 0f, 0f), 0, 9L),
      (3L, Array(0f, 0f, 1f, 0f), 0, 9L)
    ).toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("tiny", 4, "cosine"), data, partitionCols = Seq("bucket")) shouldBe true

    // move key 1 out of bucket 7 — nothing survives there, nothing new lands
    val batch = Seq((1L, Array(0f, 1f, 1f, 0f), 0, 9L))
      .toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.upsertInto(spark, base, "tiny", batch, "vec_id")

    val after = IndexCatalog.load(spark, base, "tiny")
    after.count() shouldBe 3 // no stale duplicate of key 1
    after.filter(col("vec_id") === 1).count() shouldBe 1
    after.filter(col("vec_id") === 1).head().getAs[Number]("bucket").longValue shouldBe 9L
    // the emptied bucket=7 directory is gone (dynamic overwrite alone
    // would have left the superseded row on disk)
    val dir7 = java.nio.file.Paths.get(base, "tiny", "data", "bucket=7")
    java.nio.file.Files.exists(dir7) shouldBe false
  }

  test("upsertInto with an empty batch is a no-op, not an empty.reduce crash") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert-nil").toString
    val data = Seq((1L, Array(1f, 0f), 0, 7L), (2L, Array(0f, 1f), 0, 9L))
      .toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("nil", 2, "cosine"), data, partitionCols = Seq("bucket")) shouldBe true
    val emptyBatch = data.filter(lit(false))
    IndexCatalog.upsertInto(spark, base, "nil", emptyBatch, "vec_id")
    IndexCatalog.load(spark, base, "nil").count() shouldBe 2
  }

  test("emptied-partition cleanup finds Hive-escaped directories (string values)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert-esc").toString
    // namespace 'a:b' gets Hive-escaped on disk (label=a%3Ab)
    val data = Seq(
      (1L, Array(1f, 0f), "a:b"),
      (2L, Array(0f, 1f), "plain")
    ).toDF("vec_id", "embedding", "label")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("esc", 2, "cosine"), data, partitionCols = Seq("label")) shouldBe true
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "esc", "data", "label=a%3Ab")) shouldBe true

    // move the only 'a:b' row to 'plain' — the escaped dir must be deleted
    val batch = Seq((1L, Array(1f, 1f), "plain")).toDF("vec_id", "embedding", "label")
    IndexCatalog.upsertInto(spark, base, "esc", batch, "vec_id")

    java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "esc", "data", "label=a%3Ab")) shouldBe false
    val after = IndexCatalog.load(spark, base, "esc")
    after.count() shouldBe 2
    after.filter(col("vec_id") === 1).head().getAs[String]("label") shouldBe "plain"
  }

  test("incremental upsert rewrites only touched partitions: update, move, insert") {
    import org.apache.spark.sql.functions._
    import graft.operators.RandomHyperplaneLsh
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val emb = Tables.embeddings(spark, sfDir)
    val data = emb.withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), 64))
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("ups", 64, "cosine"), data, partitionCols = Seq("bucket")) shouldBe true
    val before = IndexCatalog.load(spark, base, "ups")
    val n0 = before.count()
    val v0 = before.filter(col("vec_id") === 0).head()
    val oldBucket0 = v0.getAs[Number]("bucket").longValue

    // snapshot the on-disk partition files (path -> mtime)
    def files(): Map[String, Long] = {
      val dataDir = java.nio.file.Paths.get(base, "ups", "data")
      val s = java.nio.file.Files.walk(dataDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
          .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .toMap
      } finally s.close()
    }
    val filesBefore = files()

    // batch: vec_id 0 negated (moves to the antipodal bucket), vec_id 1
    // updated in place (same vector, new label), vec_id 99999 brand-new
    val moved = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"), transform(col("embedding"), x => -x).as("embedding"), col("label"))
    val updated = emb.filter(col("vec_id") === 1)
      .select(col("vec_id"), col("embedding"), lit(777).cast("int").as("label"))
    val fresh = emb.filter(col("vec_id") === 2)
      .select(lit(99999L).as("vec_id"), col("embedding"), col("label"))
    val batch = moved.unionByName(updated).unionByName(fresh)
      .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), 64))
    val touchedBuckets = batch.select(col("bucket")).distinct()
      .collect().map(_.getAs[Number](0).longValue).toSet + oldBucket0

    IndexCatalog.upsertInto(spark, base, "ups", batch, "vec_id")

    val after = IndexCatalog.load(spark, base, "ups")
    after.count() shouldBe n0 + 1 // one insert, two replacements
    // the moved vector left its old bucket and landed in the new one
    val row0 = after.filter(col("vec_id") === 0).collect()
    row0.length shouldBe 1
    val newBucket0 = row0.head.getAs[Number]("bucket").longValue
    assert(newBucket0 != oldBucket0)
    // in-place update visible
    after.filter(col("vec_id") === 1).head().getAs[Int]("label") shouldBe 777
    after.filter(col("vec_id") === 99999L).count() shouldBe 1

    // untouched partitions' files are bit-for-bit the ones from the build
    val filesAfter = files()
    def bucketOfPath(p: String): Option[Long] =
      "bucket=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toLong)
    val untouchedBefore = filesBefore.filter { case (p, _) =>
      bucketOfPath(p).exists(b => !touchedBuckets.contains(b)) }
    untouchedBefore.foreach { case (p, mtime) =>
      filesAfter.get(p) shouldBe Some(mtime)
    }
    assert(untouchedBefore.nonEmpty)
    // search still honors the index: the updated vec 0 is findable in its new bucket
    val q = after.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val res = IndexCatalog.search(spark, base, "ups", q, 3, buckets = Seq(newBucket0))
    res.count() should be > 0L
  }

  test("partition layout derives from the directory nesting; upsert follows a two-level layout") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val data = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 1, 7L),
      (1L, Array(0f, 1f, 0f, 0f), 2, 7L),
      (2L, Array(0f, 0f, 1f, 0f), 1, 9L)
    ).toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("two", 4, "cosine"), data,
      partitionCols = Seq("label", "bucket")) shouldBe true
    // the ON-DISK nesting is the source of truth — the caller never
    // re-declares it (a wrong caller assumption used to silently
    // interleave a conflicting directory tree)
    IndexCatalog.partitionLayout(base, "two") shouldBe Seq("label", "bucket")

    val batch = Seq((0L, Array(0f, 1f, 1f, 0f), 2, 9L))
      .toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.upsertInto(spark, base, "two", batch, "vec_id")
    val after = IndexCatalog.load(spark, base, "two")
    after.count() shouldBe 3
    val moved = after.filter(org.apache.spark.sql.functions.col("vec_id") === 0).head()
    moved.getAs[Number]("label").intValue shouldBe 2
    moved.getAs[Number]("bucket").longValue shouldBe 9L

    // a batch missing a layout column fails loudly, not corruptly
    val bad = Seq((5L, Array(1f, 1f, 0f, 0f), 9L)).toDF("vec_id", "embedding", "bucket")
    val err = intercept[IllegalArgumentException] {
      IndexCatalog.upsertInto(spark, base, "two", bad, "vec_id")
    }
    err.getMessage should include("partition column 'label'")
  }
}
