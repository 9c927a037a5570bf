package graft.sources

import graft.SparkSpecBase
import graft.sources.IndexCatalog.IndexDescriptor
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The key→partition keymap sidecar — batch-proportional DISCOVERY for
  * index maintenance (the last full-scan discovery path, closed): where
  * old rows of a maintenance batch's keys live is answered from
  * `keymap/kbucket=<b>/` shards pruned to the batch keys' hash buckets,
  * never from a scan of the index itself. Gates: the sidecar mirrors the
  * data exactly in the steady state, the discovery read partition-prunes
  * (plan evidence), untouched shards keep their files byte-for-byte,
  * the crash-window superset self-heals, vacuum compacts entries with
  * versioned-survivor awareness, and a wrong key column fails fast.
  */
class KeymapSpec extends SparkSpecBase with Matchers {

  private def buildIndex(base: String, name: String, n: Int = 50) = {
    import spark.implicits._
    val data = (0 until n).map { i =>
      (i.toLong, Array(i.toFloat, 1f), i % 3, (i % 5).toLong)
    }.toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor(name, 2, "cosine"), data,
      partitionCols = Seq("bucket")) shouldBe true
  }

  private def keymapRows(base: String, name: String): Set[(Long, String)] =
    spark.read.parquet(java.nio.file.Paths.get(base, name, "keymap").toString)
      .select(col("vec_id"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def dataLocations(base: String, name: String): Set[(Long, String)] =
    spark.read.parquet(java.nio.file.Paths.get(base, name, "data").toString)
      .select(col("vec_id"), col("bucket").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def shardFiles(base: String, name: String): Map[String, Long] = {
    val dir = java.nio.file.Paths.get(base, name, "keymap")
    val s = java.nio.file.Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    } finally s.close()
  }

  test("first maintenance backfills the keymap; it mirrors the data and discovery partition-prunes") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap").toString
    buildIndex(base, "km")
    IndexCatalog.hasKeymap(base, "km") shouldBe false

    val batch = Seq((0L, Array(9f, 9f), 0, 4L)) // moves 0 from bucket 0 to 4
      .toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.upsertInto(spark, base, "km", batch, "vec_id")

    IndexCatalog.hasKeymap(base, "km") shouldBe true
    // steady state: the sidecar IS the data's (key → partition) relation
    keymapRows(base, "km") shouldBe dataLocations(base, "km")
    keymapRows(base, "km") should contain(0L -> "4")

    // discovery evidence: the keymap read the maintenance collects is
    // partition-pruned to the probe keys' kbucket shards
    val probe = Seq(1L, 2L).toDF("vec_id")
    val locs = IndexCatalog.keymapLocations(spark, base, "km", probe, "vec_id")
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(locs.queryExecution.executedPlan.toString)
      .map(_.group(1)).toSeq
    pf.exists(f => f.contains("kbucket") && f.trim.nonEmpty) shouldBe true
    locs.collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
  }

  test("an upsert rewrites only the batch keys' kbucket shards; untouched shards keep their files") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap-io").toString
    buildIndex(base, "io", n = 400) // 400 keys spread across all 64 shards
    // build the sidecar with a first upsert, then snapshot the shards
    IndexCatalog.upsertInto(spark, base, "io",
      Seq((0L, Array(9f, 9f), 0, 0L)).toDF("vec_id", "embedding", "label", "bucket"),
      "vec_id")
    val before = shardFiles(base, "io")

    // a one-key batch touches exactly one kbucket shard
    IndexCatalog.upsertInto(spark, base, "io",
      Seq((7L, Array(8f, 8f), 1, 2L)).toDF("vec_id", "embedding", "label", "bucket"),
      "vec_id")
    val after = shardFiles(base, "io")
    val touchedShard = "kbucket=(\\d+)".r
    def shardOf(p: String) = touchedShard.findFirstMatchIn(p).map(_.group(1).toLong)
    val changed = before.keySet.filter(p => after.get(p) != before.get(p)) ++
      (after.keySet -- before.keySet)
    val changedShards = changed.flatMap(shardOf)
    changedShards.size should be <= 1 // the single key hashes into one shard
    // every other shard's files are byte-for-byte the snapshot's
    val untouched = before.filter { case (p, _) => !changedShards.exists(shardOf(p).contains) }
    untouched.foreach { case (p, m) => after.get(p) shouldBe Some(m) }
    untouched should not be empty
    // and the mirror invariant still holds after the partial rewrite
    keymapRows(base, "io") shouldBe dataLocations(base, "io")
  }

  test("a crash-window stale entry (superset) is harmless and self-heals on the key's next upsert") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap-heal").toString
    buildIndex(base, "heal")
    IndexCatalog.upsertInto(spark, base, "heal",
      Seq((3L, Array(9f, 9f), 0, 3L)).toDF("vec_id", "embedding", "label", "bucket"),
      "vec_id") // builds the sidecar
    // plant a phantom location for key 3 — what a kill between keymap
    // phase A and the data write leaves behind (invariant: superset-safe)
    val b3 = spark.range(1)
      .select(pmod(xxhash64(lit(3L)), lit(64L))).head().getLong(0)
    Seq((3L, "9999")).toDF("vec_id", "bucket")
      .coalesce(1).write.mode("append")
      .parquet(java.nio.file.Paths.get(base, "heal", "keymap", s"kbucket=$b3").toString)
    keymapRows(base, "heal") should contain(3L -> "9999")

    // the key's next upsert runs correctly THROUGH the stale entry
    // (the phantom partition matches no data) and compacts it away
    IndexCatalog.upsertInto(spark, base, "heal",
      Seq((3L, Array(7f, 7f), 0, 1L)).toDF("vec_id", "embedding", "label", "bucket"),
      "vec_id")
    val after = IndexCatalog.load(spark, base, "heal")
    after.filter(col("vec_id") === 3L).count() shouldBe 1
    after.filter(col("vec_id") === 3L).head().getAs[Number]("bucket").longValue shouldBe 1L
    keymapRows(base, "heal") shouldBe dataLocations(base, "heal")
  }

  test("vacuum compacts deleted keys' entries; a versioned survivor keeps its location") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap-vac").toString
    val data = Seq(
      (1L, Array(1f, 0f), 0, 0L, 5L),
      (2L, Array(0f, 1f), 0, 1L, 5L),
      (3L, Array(1f, 1f), 0, 1L, 9L) // survives: stored version above the delete's
    ).toDF("vec_id", "embedding", "label", "bucket", "v")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("vac", 2, "cosine"), data,
      partitionCols = Seq("bucket")) shouldBe true
    // versioned deletes at v=7: covers 1 and 2, NOT the v=9 row of key 3
    IndexCatalog.tombstone(spark, base, "vac",
      Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("vec_id", "v"),
      versionCol = Some("v"))
    IndexCatalog.vacuumTombstones(spark, base, "vac")

    val remaining = IndexCatalog.load(spark, base, "vac")
    remaining.collect().map(_.getLong(0)).toSet shouldBe Set(3L)
    // the keymap dropped the vacuumed keys and kept the survivor exactly
    keymapRows(base, "vac") shouldBe Set(3L -> "1")
    keymapRows(base, "vac") shouldBe dataLocations(base, "vac")
  }

  test("fetchByIds partition-prunes to the ids' directories, equals the filter path, hides tombstoned ids") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap-fetch").toString
    buildIndex(base, "fb", n = 50)
    val ids = Seq(3L, 17L, 42L, 99999L).toDF("vec_id") // 99999 absent
    // READ-ONLY gate (ADVICE r13): with no keymap, the fetch serves the
    // same rows through the semi-join fallback and writes NOTHING — a
    // read must never backfill a sidecar into the index directory
    IndexCatalog.hasKeymap(base, "fb") shouldBe false
    IndexCatalog.fetchByIds(spark, base, "fb", ids)
      .collect().map(_.getLong(0)).toSet shouldBe Set(3L, 17L, 42L)
    IndexCatalog.hasKeymap(base, "fb") shouldBe false
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "fb", "keymap")) shouldBe false
    // publish the keymap explicitly (the serving deployment's move) —
    // from here the fetch is the directory-pruned path
    IndexCatalog.ensureKeymap(spark, base, "fb", "vec_id")
    val fetched = IndexCatalog.fetchByIds(spark, base, "fb", ids)
    // same rows as the unpruned id filter on the logical view
    val viaFilter = IndexCatalog.load(spark, base, "fb")
      .filter(col("vec_id").isin(3L, 17L, 42L))
    fetched.orderBy(col("vec_id")).collect().map(_.toString) shouldBe
      viaFilter.orderBy(col("vec_id")).collect().map(_.toString)
    // evidence: the ids' locations reach the scan as a PartitionFilter
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(fetched.queryExecution.executedPlan.toString)
      .map(_.group(1)).toSeq
    pf.exists(f => f.contains("bucket") && f.trim.nonEmpty) shouldBe true

    // a tombstoned id vanishes from the fetch without any rewrite
    IndexCatalog.tombstone(spark, base, "fb", Seq(17L).toDF("vec_id"))
    IndexCatalog.fetchByIds(spark, base, "fb", ids)
      .collect().map(_.getLong(0)).toSet shouldBe Set(3L, 42L)
  }

  test("maintenance against the wrong key column fails fast via the marker") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap-key").toString
    buildIndex(base, "kc")
    IndexCatalog.upsertInto(spark, base, "kc",
      Seq((1L, Array(9f, 9f), 0, 0L)).toDF("vec_id", "embedding", "label", "bucket"),
      "vec_id")
    val err = intercept[IllegalArgumentException] {
      IndexCatalog.ensureKeymap(spark, base, "kc", "label")
    }
    err.getMessage should include("keyed by 'vec_id'")
  }

  test("randomized VERSIONED lifecycle: out-of-order upserts/deletes match the version-rule model after every op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap-vrand").toString
    val name = "vrand"
    import graft.sources.IndexCatalog.IndexDescriptor
    val init = (0L until 6L).map(k => (k, Array(k.toFloat, 1f), 0, (k % 3), k + 1))
      .toDF("vec_id", "embedding", "label", "bucket", "v")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor(name, 2, "cosine"), init,
      partitionCols = Seq("bucket")) shouldBe true

    // model: per-key stored (version, bucket); per-key binding tombstone
    // version (max); per-key GC floor — after a vacuum, replaying ops at
    // or below the vacuumed delete versions is OUT OF CONTRACT (the
    // documented tombstone-GC watermark), so the generator never does
    val stored = scala.collection.mutable.Map((0L until 6L).map(k => k -> (k + 1, k % 3)): _*)
    val tsMax = scala.collection.mutable.Map.empty[Long, Long]
    val floor = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val rnd = new scala.util.Random(29)
    // upsert versions are unique per key: an EQUAL-version stored-vs-batch
    // tie resolves by content hash (deterministic for the engine, but not
    // modelable here); tombstone-vs-row equality is well-defined (>=
    // hides) and needs no such care
    val usedUp = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    def freshVersion(k: Long, forUpsert: Boolean): Long = {
      var v = floor(k) + 1 + rnd.nextInt(40)
      while (forUpsert && usedUp(k).contains(v)) v = floor(k) + 1 + rnd.nextInt(40)
      if (forUpsert) usedUp(k) += v
      v
    }
    (0L until 6L).foreach(k => usedUp(k) += (k + 1)) // the build's versions

    def check(op: String): Unit = {
      // visible = stored rows NOT covered by a tombstone at >= their version
      val visible = IndexCatalog.load(spark, base, name)
        .select(col("vec_id"), col("bucket").cast("long"), col("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(1)))).toMap
      val expect = stored.toMap.filter { case (k, (v, _)) =>
        !tsMax.get(k).exists(_ >= v) }
      assert(visible == expect, s"after $op: load() != version model")
      if (IndexCatalog.hasKeymap(base, name)) {
        val km = spark.read.parquet(
          java.nio.file.Paths.get(base, name, "keymap").toString)
          .select(col("vec_id"), col("bucket"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
        val data = spark.read.parquet(
          java.nio.file.Paths.get(base, name, "data").toString)
          .select(col("vec_id"), col("bucket").cast("string"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
        assert(km == data, s"after $op: keymap != data locations")
      }
    }

    for (step <- 1 to 25) {
      val keys = (0 until 1 + rnd.nextInt(2)).map(_ => rnd.nextInt(9).toLong).distinct
      rnd.nextInt(4) match {
        case 0 | 1 => // version-aware upsert: HIGHEST version wins per key,
          // so a randomly-drawn LOWER version is a stale redelivery no-op
          val rows = keys.map { k =>
            val v = freshVersion(k, forUpsert = true); val b = rnd.nextInt(4).toLong
            if (!stored.get(k).exists(_._1 > v)) stored(k) = (v, b)
            (k, Array(rnd.nextFloat(), rnd.nextFloat()), 0, b, v)
          }
          IndexCatalog.upsertInto(spark, base, name,
            rows.toDF("vec_id", "embedding", "label", "bucket", "v"),
            "vec_id", versionCol = Some("v"))
          check(s"vupsert#$step($rows)")
        case 2 => // versioned delete: hides rows its version covers
          val rows = keys.map(k => (k, freshVersion(k, forUpsert = false)))
          IndexCatalog.tombstone(spark, base, name,
            rows.toDF("vec_id", "v"), versionCol = Some("v"))
          rows.foreach { case (k, v) =>
            tsMax(k) = math.max(tsMax.getOrElse(k, 0L), v) }
          check(s"vdelete#$step($rows)")
        case 3 => // vacuum: fold covered rows physically, GC tombstones;
          // replays at or below the vacuumed versions become out of
          // contract -> raise the per-key floor
          IndexCatalog.vacuumTombstones(spark, base, name)
          tsMax.foreach { case (k, v) =>
            if (stored.get(k).exists(_._1 <= v)) stored.remove(k)
            floor(k) = math.max(floor(k), v)
          }
          tsMax.clear()
          check(s"vacuum#$step")
      }
    }
  }

  test("randomized lifecycle: keymap mirrors data and load matches the model after every op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap-rand").toString
    val name = "rand"
    import graft.sources.IndexCatalog.IndexDescriptor
    val init = (0L until 8L).map(k => (k, Array(k.toFloat, 1f), 0, (k % 3)))
      .toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor(name, 2, "cosine"), init,
      partitionCols = Seq("bucket")) shouldBe true

    // driver-side model: key -> bucket (physical), plus the pending
    // tombstone set; visible = physical minus tombstoned
    val physical = scala.collection.mutable.Map((0L until 8L).map(k => k -> (k % 3)): _*)
    val tombstoned = scala.collection.mutable.Set.empty[Long]
    val rnd = new scala.util.Random(13) // seeded: failures reproduce

    def check(op: String): Unit = {
      val visible = IndexCatalog.load(spark, base, name)
        .select(col("vec_id"), col("bucket").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expectVisible = physical.toMap -- tombstoned
      assert(visible == expectVisible, s"after $op: load() != model")
      if (IndexCatalog.hasKeymap(base, name)) {
        val km = spark.read.parquet(
          java.nio.file.Paths.get(base, name, "keymap").toString)
          .select(col("vec_id"), col("bucket"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
        val data = spark.read.parquet(
          java.nio.file.Paths.get(base, name, "data").toString)
          .select(col("vec_id"), col("bucket").cast("string"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
        assert(km == data, s"after $op: keymap != data locations")
      }
    }

    for (step <- 1 to 30) {
      val keys = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(12).toLong).distinct
      rnd.nextInt(4) match {
        case 0 | 1 => // upsert (revives tombstoned keys, can move buckets)
          val rows = keys.map { k =>
            val b = rnd.nextInt(4).toLong
            physical(k) = b; tombstoned -= k
            (k, Array(rnd.nextFloat(), rnd.nextFloat()), 0, b)
          }
          IndexCatalog.upsertInto(spark, base, name,
            rows.toDF("vec_id", "embedding", "label", "bucket"), "vec_id")
          check(s"upsert#$step($keys)")
        case 2 => // tombstone: hides immediately, no rewrite
          val live = keys.filter(k => physical.contains(k) && !tombstoned(k))
          if (live.nonEmpty) {
            IndexCatalog.tombstone(spark, base, name, live.toDF("vec_id"))
            tombstoned ++= live
            check(s"tombstone#$step($live)")
          }
        case 3 => // vacuum folds the pending set physically
          IndexCatalog.vacuumTombstones(spark, base, name)
          tombstoned.foreach(physical.remove)
          tombstoned.clear()
          check(s"vacuum#$step")
      }
    }
  }

  test("rebuildIvf rebuilds the keymap against the new bucket layout in the same op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-keymap-rb").toString
    buildIndex(base, "rb")
    IndexCatalog.upsertInto(spark, base, "rb",
      Seq((1L, Array(9f, 9f), 0, 0L)).toDF("vec_id", "embedding", "label", "bucket"),
      "vec_id")
    IndexCatalog.hasKeymap(base, "rb") shouldBe true
    // re-bucket everything: two antipodal centroids — a keymap frozen on
    // the old layout would hide every new location from discovery
    Maintenance.rebuildIvf(spark, base, "rb",
      Seq((0L, Array(1f, 0f)), (1L, Array(-1f, 0f)))
        .toDF("cent_id", "c_embedding"))
    IndexCatalog.hasKeymap(base, "rb") shouldBe true
    keymapRows(base, "rb") shouldBe dataLocations(base, "rb") // new layout
    // and maintenance keeps flowing through the rebuilt map
    IndexCatalog.upsertInto(spark, base, "rb",
      Seq((1L, Array(-9f, 0f), 0, 1L)).toDF("vec_id", "embedding", "label", "bucket"),
      "vec_id")
    keymapRows(base, "rb") shouldBe dataLocations(base, "rb")

    // an index never maintained keeps NOT having a keymap after a rebuild
    buildIndex(base, "rb2")
    Maintenance.rebuildIvf(spark, base, "rb2",
      Seq((0L, Array(1f, 0f)), (1L, Array(-1f, 0f)))
        .toDF("cent_id", "c_embedding"))
    IndexCatalog.hasKeymap(base, "rb2") shouldBe false
  }
}
