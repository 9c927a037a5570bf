package graft.sources

import graft.SparkSpecBase
import graft.sources.IndexCatalog.IndexDescriptor
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Delete lifecycle for the persisted index (q_index_delete's gate):
  * tombstone visibility before any rewrite, vacuum's touched-partition
  * discipline, emptied-directory cleanup, no-op folds, and the
  * delete-then-reupsert revival path.
  */
class IndexDeleteSpec extends SparkSpecBase with Matchers {

  private def buildIndex(base: String, name: String) = {
    import spark.implicits._
    // three buckets with controlled placement: bucket 2 holds ONE row so
    // deleting it empties the directory
    val data = Seq(
      (1L, Array(1f, 0f), 0, 0L),
      (2L, Array(0.9f, 0.1f), 0, 0L),
      (3L, Array(0f, 1f), 1, 1L),
      (4L, Array(0.1f, 0.9f), 1, 1L),
      (5L, Array(-1f, 0f), 2, 2L)
    ).toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor(name, 2, "cosine"), data,
      partitionCols = Seq("bucket")) shouldBe true
  }

  private def dataFiles(base: String, name: String): Map[String, Long] = {
    val dataDir = java.nio.file.Paths.get(base, name, "data")
    val s = java.nio.file.Files.walk(dataDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    } finally s.close()
  }

  test("tombstone hides keys with zero data rewrite; vacuum folds touched partitions only") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-del").toString
    buildIndex(base, "del")
    val filesAtBuild = dataFiles(base, "del")

    // delete 3 (half of bucket 1) and 5 (all of bucket 2)
    IndexCatalog.tombstone(spark, base, "del", Seq(3L, 5L).toDF("vec_id"))

    // visible immediately through load() — and NOT ONE data file rewritten
    IndexCatalog.load(spark, base, "del")
      .select("vec_id").as[Long].collect().sorted shouldBe Seq(1L, 2L, 4L)
    dataFiles(base, "del") shouldBe filesAtBuild
    IndexCatalog.pendingTombstones(spark, base, "del") should not be empty
    // search goes through the same logical view: the deleted key is gone
    val q = Seq((99L, Array(0f, 1f))).toDF("q_id", "q_embedding")
    IndexCatalog.search(spark, base, "del", q, 5)
      .select("vec_id").as[Long].collect() should not contain 3L

    IndexCatalog.vacuumTombstones(spark, base, "del")

    // same logical rows, now physical: the raw tree has no trace of 3/5
    IndexCatalog.load(spark, base, "del")
      .select("vec_id").as[Long].collect().sorted shouldBe Seq(1L, 2L, 4L)
    spark.read.parquet(java.nio.file.Paths.get(base, "del", "data").toString)
      .select("vec_id").as[Long].collect().sorted shouldBe Seq(1L, 2L, 4L)
    // the emptied bucket directory is removed, tombstones cleared
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "del", "data", "bucket=2")) shouldBe false
    IndexCatalog.pendingTombstones(spark, base, "del") shouldBe None
    // bucket 0 held no deleted key: its files are bit-for-bit the build's
    val after = dataFiles(base, "del")
    val untouched = filesAtBuild.filter(_._1.contains("bucket=0"))
    untouched should not be empty
    untouched.foreach { case (p, mtime) => after.get(p) shouldBe Some(mtime) }
  }

  test("vacuum of absent keys is a no-op fold that still clears the tombstones") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-del-noop").toString
    buildIndex(base, "del")
    val filesAtBuild = dataFiles(base, "del")
    IndexCatalog.tombstone(spark, base, "del", Seq(999L).toDF("vec_id"))
    IndexCatalog.vacuumTombstones(spark, base, "del")
    dataFiles(base, "del") shouldBe filesAtBuild
    IndexCatalog.pendingTombstones(spark, base, "del") shouldBe None
    IndexCatalog.load(spark, base, "del").count() shouldBe 5
  }

  test("re-upserting a tombstoned key revives it (tombstone cleared, one live row)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-del-rev").toString
    buildIndex(base, "del")
    IndexCatalog.tombstone(spark, base, "del", Seq(3L, 5L).toDF("vec_id"))
    IndexCatalog.load(spark, base, "del").filter(col("vec_id") === 3L).count() shouldBe 0

    // the key comes back with new content — and lands in a NEW bucket, so
    // the revival must also rewrite the hidden old row's partition
    val batch = Seq((3L, Array(1f, 1f), 7, 0L)).toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.upsertInto(spark, base, "del", batch, "vec_id")

    val rows = IndexCatalog.load(spark, base, "del").filter(col("vec_id") === 3L).collect()
    rows.length shouldBe 1
    rows.head.getAs[Int]("label") shouldBe 7
    rows.head.getAs[Number]("bucket").longValue shouldBe 0L
    // key 5's tombstone survived the revival of key 3
    IndexCatalog.load(spark, base, "del").filter(col("vec_id") === 5L).count() shouldBe 0
    IndexCatalog.pendingTombstones(spark, base, "del").get
      .as[Long].collect() shouldBe Seq(5L)
    // and the raw tree holds exactly one physical row for the revived key
    spark.read.parquet(java.nio.file.Paths.get(base, "del", "data").toString)
      .filter(col("vec_id") === 3L).count() shouldBe 1
  }

  /** Version-carrying 3-bucket index for the versioned-delete gates. */
  private def buildVersionedIndex(base: String, name: String) = {
    import spark.implicits._
    val data = Seq(
      (1L, Array(1f, 0f), 0, 0L, 2L),
      (2L, Array(0.9f, 0.1f), 0, 0L, 1L),
      (3L, Array(0f, 1f), 1, 1L, 3L),
      (5L, Array(-1f, 0f), 2, 2L, 1L)
    ).toDF("vec_id", "embedding", "label", "bucket", "version")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor(name, 2, "cosine"), data,
      partitionCols = Seq("bucket")) shouldBe true
  }

  test("versioned tombstones: equal/higher versions hide, stale ones are inert, vacuum folds exactly what load hides") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-del-ver").toString
    buildVersionedIndex(base, "vdel")
    // delete key 1 at v2 (== stored v2: delete wins ties), key 3 at v1
    // (< stored v3: stale, must be inert)
    IndexCatalog.tombstone(spark, base, "vdel",
      Seq((1L, 2L), (3L, 1L)).toDF("vec_id", "version"),
      versionCol = Some("version"))
    val visible = IndexCatalog.load(spark, base, "vdel")
      .select("vec_id").as[Long].collect().sorted
    visible shouldBe Seq(2L, 3L, 5L) // 1 hidden (2 >= 2); 3 visible (1 < 3)
    // vacuum folds ONLY the covered row and clears the tombstones
    IndexCatalog.vacuumTombstones(spark, base, "vdel")
    IndexCatalog.pendingTombstones(spark, base, "vdel") shouldBe None
    spark.read.parquet(java.nio.file.Paths.get(base, "vdel", "data").toString)
      .select("vec_id").as[Long].collect().sorted shouldBe Seq(2L, 3L, 5L)
  }

  test("versioned tombstones: a higher-versioned upsert revives THROUGH the standing tombstone; a stale upsert stays hidden by it") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-del-ver2").toString
    buildVersionedIndex(base, "vdel")
    IndexCatalog.tombstone(spark, base, "vdel",
      Seq((1L, 3L), (5L, 3L)).toDF("vec_id", "version"),
      versionCol = Some("version"))
    IndexCatalog.load(spark, base, "vdel")
      .select("vec_id").as[Long].collect().sorted shouldBe Seq(2L, 3L)
    // key 1 revives at v4 (> ts v3); key 5's redelivered v2 row is STALE
    // (< ts v3) and must stay hidden — the exact case clearing the
    // tombstone on upsert would break
    val batch = Seq(
      (1L, Array(1f, 1f), 7, 0L, 4L),
      (5L, Array(-1f, 0f), 9, 2L, 2L)
    ).toDF("vec_id", "embedding", "label", "bucket", "version")
    IndexCatalog.upsertInto(spark, base, "vdel", batch, "vec_id",
      versionCol = Some("version"))
    val after = IndexCatalog.load(spark, base, "vdel")
      .select("vec_id").as[Long].collect().sorted
    after shouldBe Seq(1L, 2L, 3L)
    // the versioned tombstones were NOT cleared by the upsert (only
    // vacuum GCs them) — that is what keeps key 5 hidden
    IndexCatalog.pendingTombstones(spark, base, "vdel").get.count() shouldBe 2
    IndexCatalog.vacuumTombstones(spark, base, "vdel")
    IndexCatalog.load(spark, base, "vdel")
      .select("vec_id").as[Long].collect().sorted shouldBe Seq(1L, 2L, 3L)
  }

  test("versioned and un-versioned tombstones cannot mix on one index") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-del-mix").toString
    buildVersionedIndex(base, "vdel")
    IndexCatalog.tombstone(spark, base, "vdel",
      Seq((1L, 2L)).toDF("vec_id", "version"), versionCol = Some("version"))
    val ex = intercept[IllegalArgumentException] {
      IndexCatalog.tombstone(spark, base, "vdel", Seq(3L).toDF("vec_id"))
    }
    ex.getMessage should include("cannot mix")
  }
}
