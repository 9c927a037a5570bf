package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the churn-proportional audit arm (IncrementalAudit):
  *  - the declared lifecycle is all-zeros after real churn;
  *  - SENSITIVITY: a corruption planted in a TOUCHED bucket flags its
  *    invariant (an audit that cannot fail is decoration);
  *  - READ PRUNING: a name-preserving corruption in an UNTOUCHED bucket
  *    is not flagged AND provably never read — the untouched shard's
  *    parquet is replaced by garbage bytes, which would abort any scan
  *    that opened it; the deep audit, which does read everything, sees
  *    the drift (the division of labor the watermark design states);
  *  - the refresher bucket walks the full store over |buckets| epochs.
  */
class IncrementalAuditSpec extends SparkSpecBase with Matchers {

  private def auditMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => (r.getString(1), r.getLong(2))).toMap

  private def twins = graft.Tables.documents(spark, sfDir)
    .filter(col("doc_id") < InvertedIndex.UpsertSrcCount)
    .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
      col("text"))

  test("q_index_audit_incr: all-zeros over the touched subset after real churn") {
    val rows = IncrementalAudit.indexAuditIncr(spark, sfDir).collect()
    rows should have length 24
    rows.map(_.getLong(2)).toSeq shouldBe Seq.fill(24)(0L)
  }

  test("vector sensitivity: a phantom entry planted in a TOUCHED kbucket flags keymap_entries_live; a provably-unreachable garbage shard is never read") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{pmod, xxhash64, lit => slit}
    import graft.sources.IndexCatalog.IndexDescriptor
    val base = Files.createTempDirectory("graft-aincr-vec").toString
    val data = (0L until 80L).map(k => (k, Array(k.toFloat, 1f), 0, k % 8))
      .toDF("vec_id", "embedding", "label", "bucket")
    IndexCatalog.createIfAbsent(spark, base,
      IndexDescriptor("vs", 2, "cosine"), data,
      partitionCols = Seq("bucket")) shouldBe true
    IndexCatalog.ensureKeymap(spark, base, "vs", "vec_id")
    IncrementalAudit.baselineVector(base, "vs")
    // real churn: one upsert moving key 0 from bucket 0 to bucket 3
    IndexCatalog.upsertInto(spark, base, "vs",
      Seq((0L, Array(9f, 9f), 0, 3L)).toDF("vec_id", "embedding", "label", "bucket"),
      "vec_id")
    // plant a phantom entry for key 0 (its kbucket WAS touched by the
    // upsert) naming a location no physical row has
    val b0 = spark.range(1)
      .select(pmod(xxhash64(slit(0L)), slit(IndexCatalog.KeyBuckets.toLong)))
      .head().getLong(0)
    Seq((0L, "2")).toDF("vec_id", "bucket").coalesce(1)
      .write.mode("append")
      .parquet(Paths.get(base, "vs", "keymap", s"kbucket=$b0").toString)
    // compute exactly which data partitions THIS audit may read:
    // churned dirs (0 and 3) + the epoch-0 refresher (path-order first
    // dir) + every bucket NAMED by an entry in a touched kbucket shard
    // (b0's + the phantom's "2" + refresher kbucket 0's entries) — then
    // corrupt a shard OUTSIDE that set with garbage bytes: a green run
    // PROVES the scan never opened it
    val kmAll = spark.read.parquet(Paths.get(base, "vs", "keymap").toString)
    val named = kmAll
      .withColumn("kb", pmod(xxhash64(org.apache.spark.sql.functions.col("vec_id")),
        slit(IndexCatalog.KeyBuckets.toLong)))
      .filter(org.apache.spark.sql.functions.col("kb").isin(b0, 0L))
      .select("bucket").distinct().collect().map(_.getString(0)).toSet
    val reachable = named.map(v => s"bucket=$v") ++
      Set("bucket=0", "bucket=3") // churned + epoch-0 dir refresher
    val victimDir = (0 until 8).map(b => s"bucket=$b")
      .filterNot(reachable.contains).lastOption
      .getOrElse(fail("every partition reachable — enlarge the fixture"))
    val victim = {
      val s = Files.list(Paths.get(base, "vs", "data", victimDir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      } finally s.close()
    }
    Files.write(victim, "garbage".getBytes)
    val audit = IncrementalAudit.auditVector(spark, base, "vs").collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    audit("keymap_entries_live") should be > 0L
    audit("keymap_covers_data") shouldBe 0L
  }

  test("sensitivity: a dict corruption in a TOUCHED tbucket flags dict_df_matches_postings") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "aincr-sens")
    IncrementalAudit.baselineInverted(layout)
    InvertedIndex.upsertDocs(spark, layout, twins)
    // drop one TOUCHED dict shard wholesale — every term in it now has
    // postings but no dict row
    val touchedBucket = spark.read.parquet(layout.dataPath)
      .filter(col("doc_id") >= InvertedIndex.UpsertIdOffset)
      .select(col("tbucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).min
    Maintenance.deleteRecursively(
      Paths.get(layout.dictPath).resolve(s"tbucket=$touchedBucket"))
    val audit = auditMap(IncrementalAudit.auditInverted(spark, layout))
    audit("dict_df_matches_postings") should be > 0L
    // the lex sidecar still holds the dropped bucket's keys — the same
    // planting is visible from the lex/dict pair's own restricted
    // comparison (one corruption, each store pair seeing it)
    audit("lex_matches_dict") should be > 0L
    // ... and the deletion-neighborhood sidecar sees the same planting
    // through ITS restricted comparison — one corruption, three pairs
    audit("del_matches_dict") should be > 0L
    (audit - "dict_df_matches_postings" - "lex_matches_dict" -
      "del_matches_dict").values.foreach(_ shouldBe 0L)
  }

  test("read pruning: a garbage file in an UNTOUCHED tbucket is never opened; the deep audit still catches a name-preserving swap") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "aincr-prune")
    IncrementalAudit.baselineInverted(layout)
    // NO churn: the only shards the audit may read are epoch 0's
    // refresher buckets (tbucket 0 / dbucket 0) — every other bucket is
    // untouched by construction. The victim is the PATH-ORDER-last
    // populated dict bucket so schema inference (which reads the first
    // file footer in path order) never lands on the garbage either.
    val untouched = {
      val s = Files.list(Paths.get(layout.dictPath))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_))
          .map(_.getFileName.toString).filter(_ != "tbucket=0")
          .toSeq.max.stripPrefix("tbucket=").toLong
      } finally s.close()
    }
    val dictShard = Paths.get(layout.dictPath).resolve(s"tbucket=$untouched")
    val victim = {
      val s = Files.list(dictShard)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      } finally s.close()
    }
    // name-preserving corruption: same file name, garbage bytes — any
    // scan that opens it throws, so a green incremental audit PROVES the
    // shard was pruned, not merely tolerated
    Files.write(victim, "not a parquet file".getBytes)
    val audit = auditMap(IncrementalAudit.auditInverted(spark, layout))
    audit.values.foreach(_ shouldBe 0L)
    // the deep audit reads everything — it must abort on the garbage
    // (a real fleet's deep pass surfaces the corruption loudly)
    intercept[Throwable] {
      InvertedIndex.auditFrame(spark, layout).collect()
    }
  }

  test("minhash sensitivity: a band row dropped from a TOUCHED bbucket flags bands_cover_sigs") {
    val layout = MinhashIndex.cloneIndex(spark, sfDir, "aincr-mh-sens")
    IncrementalAudit.baselineMinhash(layout)
    val batchBands = MinhashIndex.upsertDocs(spark, layout, twins)
    // rewrite one touched band shard WITHOUT one of the batch's rows —
    // a sig now derives a band row the store lacks
    val bb = batchBands.select(col("bbucket")).distinct()
      .collect().map(_.getLong(0)).min
    val shard = Paths.get(layout.bandsPath).resolve(s"bbucket=$bb")
    val surviving = spark.read.parquet(shard.toString)
      .filter(col("doc_id") < InvertedIndex.UpsertIdOffset)
      .localCheckpoint(true)
    Maintenance.deleteRecursively(shard)
    surviving.write.parquet(shard.toString)
    val audit = auditMap(IncrementalAudit.auditMinhash(spark, layout))
    audit("bands_cover_sigs") should be > 0L
  }

  test("graph incremental sensitivity: a phantom row appended to a shard flags exactly its direction") {
    import spark.implicits._
    val shared = graft.operators.GraphOps.ensureGraphStore(spark, sfDir)
    val asg = graft.operators.GraphOps.ivfTop2AssignmentsOf(spark, sfDir,
      graft.Tables.embeddings(spark, sfDir)).localCheckpoint(true)
    val nodeBuckets = asg.filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").cast("int").as("gbucket"))
    val bucketOf = nodeBuckets.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edgeSet = spark.read.parquet(shared.resolve("edges").toString)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val memberIds = spark.read.parquet(shared.resolve("members").toString)
      .collect().map(_.getLong(0)).sorted
    val (a, b) = (for {
      x <- memberIds.iterator; y <- memberIds.iterator
      if x != y && !edgeSet((x, y))
    } yield (x, y)).next()
    // direction 2: a phantom REVERSE row (the appended file makes its
    // shard touched by construction — an inventory diff sees any change)
    val r2 = Paths.get(graft.Scratch.dir("aincr-graph-d2"))
    Maintenance.copyTree(shared, r2)
    IncrementalAudit.baselineGraph(r2)
    Seq((b, a)).toDF("dst", "src").coalesce(1).write.mode("append")
      .parquet(r2.resolve("redges").resolve(s"dbucket=${bucketOf(b)}").toString)
    val audit2 = auditMap(IncrementalAudit.auditGraph(spark, r2, nodeBuckets))
    audit2("edges_cover_redges") should be > 0L
    audit2("redges_cover_edges") shouldBe 0L
    // direction 1: a phantom FORWARD edge with no reverse row
    val r1 = Paths.get(graft.Scratch.dir("aincr-graph-d1"))
    Maintenance.copyTree(shared, r1)
    IncrementalAudit.baselineGraph(r1)
    Seq((a, b)).toDF("src", "dst").coalesce(1).write.mode("append")
      .parquet(r1.resolve("edges").resolve(s"sbucket=${bucketOf(a)}").toString)
    val audit1 = auditMap(IncrementalAudit.auditGraph(spark, r1, nodeBuckets))
    audit1("redges_cover_edges") should be > 0L
    audit1("edge_endpoints_in_members") shouldBe 0L
  }

  test("embed incremental sensitivity: a norms shard dropped from a TOUCHED dbucket flags norms_docs_match_lens") {
    val layout = InvertedIndex.cloneIndexNamed(spark, sfDir,
      EmbedIndex.IndexName, "embed16", "aincr-emb-sens")
    IncrementalAudit.baselineInverted(layout)
    InvertedIndex.upsertDocs(spark, layout, twins)
    // drop a norms shard the churn touched (the twins' dbuckets)
    val touchedDb = twins.select(InvertedIndex.dbucketCol(col("doc_id")).as("b"))
      .distinct().collect().map(_.getLong(0)).min
    Maintenance.deleteRecursively(
      java.nio.file.Paths.get(InvertedIndex.normsPathOf(layout))
        .resolve(s"dbucket=$touchedDb"))
    val audit = auditMap(IncrementalAudit.auditInverted(spark, layout,
      artifact = "embed"))
    audit("norms_docs_match_lens") should be > 0L
    audit("dict_df_matches_postings") shouldBe 0L
  }

  test("a red run HOLDS the watermark: the flagged bucket stays in the touched set until it audits clean") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "aincr-hold")
    IncrementalAudit.baselineInverted(layout)
    InvertedIndex.upsertDocs(spark, layout, twins)
    val touchedBucket = spark.read.parquet(layout.dataPath)
      .filter(col("doc_id") >= InvertedIndex.UpsertIdOffset)
      .select(col("tbucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).min
    Maintenance.deleteRecursively(
      Paths.get(layout.dictPath).resolve(s"tbucket=$touchedBucket"))
    // first run flags — and must NOT advance the watermark
    auditMap(IncrementalAudit.auditInverted(spark, layout))
      .apply("dict_df_matches_postings") should be > 0L
    // a SECOND run with no new churn still sees the corrupt bucket (a
    // dropped first report loses nothing) — the pre-fix behavior marked
    // it 'audited' and went green here
    auditMap(IncrementalAudit.auditInverted(spark, layout))
      .apply("dict_df_matches_postings") should be > 0L
    // repair (dict is derived — rebuild from postings), audit clean,
    // watermark advances: the NEXT run is back to refresher-only scope
    InvertedIndex.rebuildDerived(spark, layout)
    auditMap(IncrementalAudit.auditInverted(spark, layout))
      .values.foreach(_ shouldBe 0L)
    auditMap(IncrementalAudit.auditInverted(spark, layout))
      .values.foreach(_ shouldBe 0L)
  }

  test("the refresher bucket covers the full store over TermBuckets epochs without churn") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "aincr-refresh")
    IncrementalAudit.baselineInverted(layout)
    // corrupt a shard by a name-preserving swap (invisible to the
    // inventory diff): copy bucket A's dict file over bucket B's — B's
    // dict rows now describe A's terms, a df mismatch on every term
    def dictFile(b: Long) = {
      val s = Files.list(Paths.get(layout.dictPath).resolve(s"tbucket=$b"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      } finally s.close()
    }
    // pick two POPULATED dict buckets (a small vocabulary leaves some
    // empty); the target is the smaller positive one so the epoch walk
    // stays short
    val populated = {
      val s = Files.list(Paths.get(layout.dictPath))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_))
          .map(_.getFileName.toString.stripPrefix("tbucket=").toLong)
          .toSeq.sorted
      } finally s.close()
    }
    val target = populated.find(_ > 0L).get
    val src = populated.find(b => b != target).get
    val (srcF, dstF) = (dictFile(src), dictFile(target))
    Files.copy(srcF, dstF, StandardCopyOption.REPLACE_EXISTING)
    // carry the Hadoop checksum sidecar too: the swap must read as WRONG
    // DATA (a df mismatch), not as an I/O error
    val srcCrc = srcF.resolveSibling("." + srcF.getFileName + ".crc")
    val dstCrc = dstF.resolveSibling("." + dstF.getFileName + ".crc")
    if (Files.exists(srcCrc))
      Files.copy(srcCrc, dstCrc, StandardCopyOption.REPLACE_EXISTING)
    else Files.deleteIfExists(dstCrc)
    // epochs 0..target-1 refresh earlier tbuckets: the swap at `target`
    // stays invisible (no churn, not yet refreshed)...
    (0L until target).foreach { _ =>
      auditMap(IncrementalAudit.auditInverted(spark, layout))
        .apply("dict_df_matches_postings") shouldBe 0L
    }
    // ...and epoch `target`'s refresher reaches it and flags
    auditMap(IncrementalAudit.auditInverted(spark, layout))
      .apply("dict_df_matches_postings") should be > 0L
  }
}
