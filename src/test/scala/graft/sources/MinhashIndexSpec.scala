package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the persisted MinHash-LSH dedup index (MinhashIndex):
  * persisted == in-memory pair-for-pair, maintenance touches only the
  * batch's bucket directories, a physical delete leaves the stores equal
  * to a from-scratch build over the reduced corpus, and a redelivered CDC
  * micro-batch is a no-op. */
class MinhashIndexSpec extends SparkSpecBase with Matchers {

  /** (partition-dir name → sorted file names) inventory of a bucketed
    * store — the byte-stability probe: an untouched bucket keeps exactly
    * its file list. */
  private def inventory(root: String): Map[String, Seq[String]] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Map.empty
    else {
      val dirs = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        dirs.iterator().asScala
          .filter(d => Files.isDirectory(d))
          .map { d =>
            val fs = Files.list(d)
            try d.getFileName.toString ->
              fs.iterator().asScala.map(_.getFileName.toString)
                .filter(_.endsWith(".parquet")).toSeq.sorted
            finally fs.close()
          }.toMap
      } finally dirs.close()
    }
  }

  private def cloneFor(tag: String): MinhashIndex.Layout =
    MinhashIndex.cloneIndex(spark, sfDir, tag)

  test("q_minhash_index: pairs served from the persisted stores equal the in-memory pipeline") {
    val indexed = MinhashIndex.minhashIndex(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val direct = Dedup.minhashLshPairs(
        graft.Tables.documents(spark, sfDir), 0.5)
      .orderBy(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    indexed shouldBe direct
    indexed should not be empty // the corpus plants near-dups — a vacuous pass hides a broken join
  }

  test("ensure() is idempotent: the second call leaves the index untouched") {
    val layout = MinhashIndex.ensure(spark, sfDir)
    val marker = Paths.get(IndexCatalog.cacheBase(sfDir),
      MinhashIndex.IndexName, "_minhash_index.json")
    val before = Files.getLastModifiedTime(marker)
    val sigsBefore = inventory(layout.sigsPath)
    MinhashIndex.ensure(spark, sfDir)
    Files.getLastModifiedTime(marker) shouldBe before
    inventory(layout.sigsPath) shouldBe sigsBefore
  }

  test("upsert appends only into the batch's bucket directories") {
    val layout = cloneFor("minhash-touch")
    val sigsBefore = inventory(layout.sigsPath)
    val bandsBefore = inventory(layout.bandsPath)
    val twins = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 3)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("text"))
    val batchBands = MinhashIndex.upsertDocs(spark, layout, twins)
    import spark.implicits._
    val touchedB = batchBands.select(col("bbucket")).distinct()
      .as[Long].collect().map(b => s"bbucket=$b").toSet
    val touchedS = twins
      .select(MinhashIndex.sbucketCol(col("doc_id")).as("b")).distinct()
      .as[Long].collect().map(b => s"sbucket=$b").toSet
    val sigsAfter = inventory(layout.sigsPath)
    val bandsAfter = inventory(layout.bandsPath)
    // untouched buckets keep their exact file lists
    sigsAfter.filterNot { case (d, _) => touchedS(d) } shouldBe
      sigsBefore.filterNot { case (d, _) => touchedS(d) }
    bandsAfter.filterNot { case (d, _) => touchedB(d) } shouldBe
      bandsBefore.filterNot { case (d, _) => touchedB(d) }
    // touched buckets strictly grew (append, not rewrite)
    touchedS.foreach { d =>
      sigsAfter(d).toSet should contain allElementsOf sigsBefore.getOrElse(d, Nil).toSet
      sigsAfter(d).size should be > sigsBefore.getOrElse(d, Nil).size
    }
  }

  test("delete folds to the exact from-scratch state over the reduced corpus") {
    val layout = cloneFor("minhash-delfold")
    val docs = graft.Tables.documents(spark, sfDir)
    val dead = docs.filter(col("doc_id") % 21 === 6).select(col("doc_id"))
    MinhashIndex.deleteDocs(spark, layout, dead)
    val storedSigs = spark.read.parquet(layout.sigsPath)
      .select(col("doc_id"), col("sig")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).sortBy(_._1).toSeq
    val rebuilt = Dedup.minhashSignatures(
        docs.filter(!(col("doc_id") % 21 === 6))).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).sortBy(_._1).toSeq
    storedSigs shouldBe rebuilt
    val storedBands = spark.read.parquet(layout.bandsPath)
      .select(col("doc_id"), col("band_idx"), col("band_hash")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val rebuiltBands = Dedup.lshBands(Dedup.minhashSignatures(
        docs.filter(!(col("doc_id") % 21 === 6)))).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    storedBands shouldBe rebuiltBands
    // no served pair may touch a dead doc
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    MinhashIndex.pairsFromIndex(spark, layout, 0.5).collect().foreach { r =>
      deadIds should not contain r.getLong(0)
      deadIds should not contain r.getLong(1)
    }
  }

  test("delete is idempotent and ignores ids the index never held") {
    val layout = cloneFor("minhash-delidem")
    val ids = spark.range(3).select((col("id") + 7000000L).as("doc_id"))
    val sigsBefore = inventory(layout.sigsPath)
    MinhashIndex.deleteDocs(spark, layout, ids) // never indexed: no-op...
    // ...on CONTENT (rows survive bit-identically); the touched sbuckets
    // legitimately rewrite their files (discovery can't know the ids are
    // absent without reading), so compare row sets, not file lists
    val dead = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 21 === 6).select(col("doc_id"))
    MinhashIndex.deleteDocs(spark, layout, dead)
    val after = spark.read.parquet(layout.sigsPath).count()
    MinhashIndex.deleteDocs(spark, layout, dead) // second delete: no-op
    spark.read.parquet(layout.sigsPath).count() shouldBe after
    sigsBefore should not be empty
  }

  test("a redelivered CDC micro-batch is a no-op (batchId commit marker)") {
    val layout = cloneFor("minhash-redeliver")
    val batch = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 3)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("text"))
      .withColumn("op", lit("U"))
      .unionByName(graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") === 6L)
        .select(col("doc_id"), col("text")).withColumn("op", lit("D")))
    MinhashIndex.applyCdcBatch(layout, batch, batchId = 7L)
    val sigsAfter = spark.read.parquet(layout.sigsPath)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    MinhashIndex.applyCdcBatch(layout, batch, batchId = 7L)
    spark.read.parquet(layout.sigsPath)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq shouldBe sigsAfter
    // the trigger really applied: adds present, the delete absent
    sigsAfter should contain (InvertedIndex.UpsertIdOffset)
    sigsAfter should not contain 6L
  }

  test("q_minhash_upsert: batch-probe serving finds each twin's est=1.0 partner") {
    val rows = MinhashIndex.minhashUpsert(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every twin doc pairs with its identical-text source at estimate 1.0
    (0L until InvertedIndex.UpsertSrcCount.toLong).foreach { k =>
      assert(rows.exists(p =>
        p._1 == k && p._2 == k + InvertedIndex.UpsertIdOffset && p._3 == 1.0),
        s"missing est=1.0 twin pair for doc $k")
    }
    // and every served pair touches the batch (the declared pair universe)
    rows.foreach { p =>
      assert(p._1 >= InvertedIndex.UpsertIdOffset ||
        p._2 >= InvertedIndex.UpsertIdOffset)
    }
  }

  test("q_minhash_compact: fragmented sig/band shards fold to one file each; untouched shards byte-stable; serving unchanged") {
    val layout = cloneFor("minhash-compact-spec")
    val twins = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < InvertedIndex.UpsertSrcCount)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("text"))
    val half = InvertedIndex.UpsertIdOffset + InvertedIndex.UpsertSrcCount / 2
    MinhashIndex.upsertDocs(spark, layout, twins.filter(col("doc_id") < half))
    MinhashIndex.upsertDocs(spark, layout, twins.filter(col("doc_id") >= half))
    def maxFiles(root: String): Int = inventory(root).values.map(_.length).max
    maxFiles(layout.sigsPath) should be > 1
    maxFiles(layout.bandsPath) should be > 1
    val counts = Seq(layout.sigsPath, layout.bandsPath)
      .map(s => spark.read.parquet(s).count())
    // an already-compact shard (one file) must survive the fold untouched
    def singleFileShards(root: String): Map[String, Seq[String]] =
      inventory(root).filter(_._2.length == 1)
    val stableSigs = singleFileShards(layout.sigsPath)
    val stableBands = singleFileShards(layout.bandsPath)
    MinhashIndex.compactStores(spark, layout)
    maxFiles(layout.sigsPath) shouldBe 1
    maxFiles(layout.bandsPath) shouldBe 1
    Seq(layout.sigsPath, layout.bandsPath).zip(counts).foreach { case (s, n) =>
      spark.read.parquet(s).count() shouldBe n
    }
    stableSigs.foreach { case (shard, files) =>
      inventory(layout.sigsPath)(shard) shouldBe files
    }
    stableBands.foreach { case (shard, files) =>
      inventory(layout.bandsPath)(shard) shouldBe files
    }
    // the declared query lands on q_minhash_upsert's exact pair set
    val compacted = MinhashIndex.minhashCompact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val upserted = MinhashIndex.minhashUpsert(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    compacted shouldBe upserted
  }
}
