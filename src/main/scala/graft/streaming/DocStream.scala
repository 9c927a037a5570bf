package graft.streaming

import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Streaming corpus ingestion with incremental exact dedup — the
  * nightly-append pipeline (q_dedup_incremental's shape) as a Structured
  * Streaming sink: each micro-batch of documents is deduped within
  * itself, anti-joined against the PERSISTED corpus's fingerprints, and
  * only the genuinely new documents append.
  *
  * Idempotent by construction (the foreachBatch retry contract): a
  * replayed micro-batch re-runs the anti-join against a corpus that
  * already contains its survivors, so the replay appends nothing — no
  * transaction log needed, the dedup IS the exactly-once mechanism.
  * Within a batch the lowest doc_id per fingerprint wins
  * (deterministic).
  *
  * At scale: the corpus side is read as fingerprints only (column
  * pruning reaches the scan); the batch side is micro-batch-sized and
  * broadcasts, so per-batch cost is ∝ batch — the corpus is never
  * reshuffled, exactly like the batch q_dedup_incremental. Appends are
  * new parquet files; [[graft.sources.Maintenance.compactPartitions]]
  * is the matching compaction story for a long-running trickle.
  */
object DocStream {

  /** Batch-side core (shared with the spec's batch-parity check): dedup
    * `batch` within itself and against `corpusFps` (a `fp` column or
    * null), returning the rows to append with their fingerprints.
    *
    * A null text fingerprints as the empty string (not NULL): a NULL join
    * key never matches in the anti-join, so a null-text doc would
    * re-append on every batch AND every replay — breaking both dedup and
    * the idempotency contract.
    *
    * Join direction: Spark cannot broadcast the LEFT side of a left_anti,
    * so `batch ANTI corpus` would broadcast-or-shuffle the CORPUS. Instead
    * the corpus is probed with a broadcast left_semi (corpus stays
    * map-side, output = the batch fingerprints already present — bounded
    * by the batch), and the batch anti-joins against that tiny frame —
    * the `PipelineOps.incrementalDedup` discipline: per-batch cost ∝
    * batch, corpus never reshuffles. */
  def newDocuments(batch: DataFrame, corpusFps: Option[DataFrame]): DataFrame = {
    val withFp = batch.withColumn("fp",
      fingerprint(coalesce(col("text"), lit(""))))
    val inBatch = withFp
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("text"))).as("b"))
      .select(col("b.doc_id").as("doc_id"), col("b.text").as("text"), col("fp"))
    corpusFps match {
      case Some(fps) =>
        val seen = fps.select(col("fp"))
          .join(broadcast(inBatch.select(col("fp"))), Seq("fp"), "left_semi")
        inBatch.join(broadcast(seen), Seq("fp"), "left_anti")
      case None => inBatch
    }
  }

  /** Attach a document stream (`doc_id, text`) to a persisted deduped
    * corpus at `path` as a foreachBatch maintenance sink. Caller
    * starts/stops the returned query. */
  def maintainCorpus(stream: DataFrame, path: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val corpus =
          if (corpusExists(spark, path)) Some(spark.read.parquet(path))
          else None
        // materialize ONCE: the anti-join plan would otherwise re-run the
        // batch dedup during the write
        val fresh = newDocuments(batch, corpus).localCheckpoint(true)
        if (!fresh.isEmpty)
          fresh.select(col("doc_id"), col("text"), col("fp"))
            .write.mode("append").parquet(path)
      }

  def start(stream: DataFrame, path: String): StreamingQuery =
    maintainCorpus(stream, path).start()

  private def corpusExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Stamp strictly increasing file mtimes in part-name order. The file
    * source consumes by (mtime, path); parallel-written parts carry tie
    * mtimes, making micro-batch order nondeterministic across runs — the
    * StreamingDemo lesson (one out-of-order file late-dropped 25% of
    * events there; here it would flip which duplicate survives). */
  def stampAscendingMtimes(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    // Files.list holds the directory stream open until closed — leak one
    // fd per streaming-query invocation without the Using
    val parts = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(dir))) { s =>
      s.iterator().asScala.filter(_.getFileName.toString.startsWith("part-"))
        .toSeq.sortBy(_.getFileName.toString)
    }
    val base = System.currentTimeMillis() - 3600 * 1000
    parts.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 10000L))
    }
  }

  /** Q-stream-dedup: the STREAMING ingestion path run to completion over
    * q_dedup_exact's corpus (documents ∪ id-shifted copy), checked
    * against the SAME DuckDB oracle — the driver-gated proof that the
    * incremental streaming dedup converges to the batch answer, not just
    * that stream == batch Spark.
    *
    * The corpus replays as doc_id-ascending range files, one per
    * micro-batch: each fingerprint's globally-lowest doc_id therefore
    * arrives in the earliest micro-batch containing that fingerprint,
    * and within a batch the lowest id wins — so the streaming survivor
    * set equals batch keep-lowest exact dedup, which is what the oracle
    * states. (An arbitrary arrival order keeps FIRST-arrival per fp —
    * also a valid dedup, but not the oracle's deterministic statement.) */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val shift = docs.agg((max(col("doc_id")) + 1L).as("mi"))
    val corpus = docs.unionByName(
      docs.crossJoin(broadcast(shift))
        .select((col("doc_id") + col("mi")).as("doc_id"), col("text")))
    val staged = graft.Scratch.dir("graft-streamdedup-in")
    corpus.repartitionByRange(3, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(staged)
    stampAscendingMtimes(staged)
    val outPath = graft.Scratch.dir("graft-streamdedup-out") + "/corpus"
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = start(stream, outPath)
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_dedup", q)
    } finally { q.stop() }
    spark.read.parquet(outPath)
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_dedup" -> (streamDedup _))

  /** q_dedup_exact's statement with ONE declared difference: the
    * streaming ingestion fingerprints a null text as the EMPTY STRING
    * ([[newDocuments]] — a NULL anti-join key would re-append the doc on
    * every batch and break replay idempotency), so the oracle states
    * `coalesce(text, '')` too. On a null-free corpus (all testdata SFs)
    * the two statements are identical; on a dirty one this oracle is the
    * contract the stream actually implements. */
  val streamDedupSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
      |    text FROM documents),
      |fps AS (SELECT doc_id,
      |          md5(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g'))) AS fp
      |        FROM corpus),
      |r AS (SELECT doc_id, fp, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |      FROM fps)
      |SELECT doc_id, fp FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_stream_dedup" -> streamDedupSql)
}
