package graft.streaming

import graft.operators.{RandomHyperplaneLsh, Upsert}
import graft.sources.IndexCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Streaming index maintenance — the reference's ingest loop
  * (`upsert/upsert.go:154-190`: read vectors one by one, POST each to the
  * index) recast as Structured Streaming: a stream of vector records is
  * merged into a PERSISTED bucket-partitioned ANN index per micro-batch.
  *
  * Each micro-batch is one [[IndexCatalog.upsertInto]] call: last-write-
  * wins by key, rewriting only the partitions the batch touches. The
  * merge is deterministic, so a foreachBatch RETRY of the same micro-batch
  * converges to the same index state (idempotent sink, the Structured
  * Streaming recovery contract). Within a batch, duplicate keys resolve by
  * the explicit `version` column ([[Upsert.lastWriteWins]]) — arrival
  * order inside a micro-batch is not meaningful.
  *
  * At scale: the batch's bucket signatures are computed map-side before
  * the merge; rewrite I/O per micro-batch is proportional to the batch's
  * partition footprint (see upsertInto), so a steady trickle of updates
  * never rewrites the full index.
  */
object VectorStream {

  /** Attach a vector stream (`vec_id, embedding, label, version`) to a
    * persisted LSH-bucketed index as a foreachBatch maintenance sink.
    * Caller starts/stops the returned query.
    *
    * The bucket dimension is DERIVED from the index descriptor, never
    * trusted from the caller (IndexCatalog's partitionLayout/metric
    * rule): a caller-supplied dim that contradicted the build would
    * compute bucket ids query-time probing never selects — updated
    * vectors silently vanishing from search results.
    *
    * `version` is KEPT through the merge (the index stores it):
    * within-batch duplicates resolve here, and CROSS-batch conflicts
    * resolve inside the version-aware [[IndexCatalog.upsertInto]] — so
    * an at-least-once source that redelivers an old version in a later
    * micro-batch cannot regress the key (the stale row loses the
    * highest-version window regardless of arrival order). */
  def maintainIndex(stream: DataFrame, basePath: String,
                    name: String): DataStreamWriter[Row] = {
    val dim = IndexCatalog.describe(basePath, name)
      .getOrElse(throw new IllegalArgumentException(s"no such index: $name"))
      .dimension
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize the deduped+bucketed batch ONCE: upsertInto evaluates
        // it several times (keys, touched, union) and each pass would
        // re-run the window dedup + 8 plane dots per vector otherwise
        // tie-break equal (key, version) rows by a content hash: an
        // at-least-once upstream can duplicate a version with different
        // payloads, and a retry must pick the SAME winner (idempotency)
        val deduped = Upsert.lastWriteWins(batch, Seq("vec_id"), "version",
            tieBreak = Seq(xxhash64(col("embedding"), col("label"))))
          .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), dim))
          .localCheckpoint(true)
        if (!deduped.isEmpty)
          IndexCatalog.upsertInto(batch.sparkSession, basePath, name,
            deduped, "vec_id", versionCol = Some("version"))
      }
  }

  /** Convenience: start with a trigger of all available data (used by the
    * spec; production callers pick their own trigger). */
  def start(stream: DataFrame, basePath: String, name: String): StreamingQuery =
    maintainIndex(stream, basePath, name).start()

  /** Q-stream-upsert: STREAMING INDEX MAINTENANCE run to completion and
    * checked against the last-write-wins oracle — the fifth driver-gated
    * streaming surface, and the one that exercises the reference's whole
    * ingest loop shape (`upsert/upsert.go:154-190`) under micro-batched
    * delivery: an OFFLINE initial build (version 0, the full corpus),
    * then two SPARSE streamed update batches merged via [[maintainIndex]]
    * — `% 101` keys relabeled at version 1; then `% 202` keys relabeled
    * AGAIN at version 2 (a subset of the v1 batch — the replay proves the
    * later version wins across micro-batch boundaries), `% 103` keys
    * relabeled at version 2, and `% 97` keys re-keyed past MAX(vec_id)
    * as inserts.
    * The batches are deliberately a TRICKLE (tens of keys against a
    * 256-bucket layout) so the declared query demonstrates the
    * partition-scoped-rewrite claim — dense batches touching every bucket
    * would silently degenerate to full-index rewrites. The final
    * PERSISTED index state must hash-match the oracle's flat
    * ROW_NUMBER-over-version semantics — the declared-query form of
    * VectorStreamSpec's incremental-maintenance assertions.
    *
    * The index builds under a fresh temp base per run (not the shared
    * warm cache): the query IS the build+maintain lifecycle, so caching
    * it would measure nothing. */
  def streamUpsert(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val emb = Tables.embeddings(spark, dir)
    val base = graft.Scratch.dir("graft-streamupsert-idx")
    val name = "stream-upsert"
    IndexCatalog.createIfAbsent(spark, base,
      IndexCatalog.IndexDescriptor(name, 64, "cosine"),
      initialState(emb), partitionCols = Seq("bucket"))
    val (staged, schema) = stageBatches(spark, dir)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = start(stream, base, name)
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_upsert", q)
    } finally { q.stop() }
    IndexCatalog.load(spark, base, name)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** The offline initial index state (version 0, full corpus). */
  private def initialState(emb: DataFrame): DataFrame =
    emb.withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), 64))
      .withColumn("version", lit(0L)) // stored: cross-batch LWW needs it

  /** Stage the two maintenance micro-batches as ordered stream files
    * (shared by the lifecycle and steady-state queries — one definition,
    * one oracle).
    *
    * Key 0 divides everything: the %103 branch must exclude %202 keys or
    * key 0 carries two DIFFERENT v2 rows and the oracle's version
    * tie-break is nondeterministic; insert re-key offset = max+1 (the
    * q_scd2 lesson — a fixed constant collides once the id domain grows). */
  private def stageBatches(spark: org.apache.spark.sql.SparkSession,
                           dir: String): (String, org.apache.spark.sql.types.StructType) = {
    import graft.Tables
    val emb = Tables.embeddings(spark, dir)
    val staged = graft.Scratch.dir("graft-streamupsert-in")
    val maxId = emb.agg((max(col("vec_id")) + 1L).as("mi"))
    val b1 = emb.filter(col("vec_id") % 101 === 0)
      .select(col("vec_id"), col("embedding"),
        (col("label") + 100).as("label"), lit(1L).as("version"))
    val b2 = emb.filter(col("vec_id") % 202 === 0)
      .select(col("vec_id"), col("embedding"),
        (col("label") + 200).as("label"), lit(2L).as("version"))
      .unionByName(emb
        .filter(col("vec_id") % 103 === 0 && col("vec_id") % 202 =!= 0)
        .select(col("vec_id"), col("embedding"),
          (col("label") + 150).as("label"), lit(2L).as("version")))
      .unionByName(emb.filter(col("vec_id") % 97 === 0)
        .crossJoin(broadcast(maxId))
        .select((col("vec_id") + col("mi")).as("vec_id"), col("embedding"),
          col("label"), lit(2L).as("version")))
    b1.coalesce(1).write.mode("overwrite").parquet(staged)
    DocStream.stampAscendingMtimes(staged)
    b2.coalesce(1).write.mode("append").parquet(staged)
    (staged, b1.schema)
  }

  /** Q-stream-upsert-steady: the SAME maintenance micro-batches as
    * q_stream_upsert, timed against a WARM index — the steady-state half
    * of the bench split the full-lifecycle query cannot provide (its
    * number is dominated by the one-time 256-bucket offline build, which
    * a production maintenance loop pays once, not per trigger).
    *
    * Protocol: the initial index state builds ONCE into the shared
    * persisted cache (createIfAbsent — amortized across runs exactly like
    * q_ann_ivf_persisted's index); each run then FILE-COPIES the warm
    * index into a fresh scratch root (a directory clone is plain I/O,
    * ~10× cheaper than the Spark build, and keeps the query idempotent —
    * maintenance mutates the index in place, so running against the cache
    * itself would accumulate state across runs) and replays the two
    * micro-batches against the clone. The bench line is copy + N
    * maintenance triggers; BASELINE.md records it next to the lifecycle
    * number as the build-vs-steady split. Same oracle as q_stream_upsert:
    * identical final LWW state through a different lifecycle. */
  /** Ensure the SHARED warm initial index exists (full corpus at version
    * 0 — built once into the persisted cache) and file-clone it into a
    * fresh scratch root. ONE definition of the warm layout, shared by
    * every warm-lifecycle stream query (q_stream_upsert_steady,
    * q_stream_cdc) — a layout change applied to one copy and not the
    * other would silently desynchronize queries that claim "same
    * layout". */
  private[graft] def cloneWarmIndex(spark: org.apache.spark.sql.SparkSession,
                             dir: String, scratchLabel: String): (String, String) = {
    import graft.Tables
    val warmBase = IndexCatalog.cacheBase(dir)
    val name = "stream-upsert-warm"
    IndexCatalog.createIfAbsent(spark, warmBase,
      IndexCatalog.IndexDescriptor(name, 64, "cosine"),
      initialState(Tables.embeddings(spark, dir)), partitionCols = Seq("bucket"))
    val base = graft.Scratch.dir(scratchLabel)
    copyTree(java.nio.file.Paths.get(warmBase, name),
      java.nio.file.Paths.get(base, name))
    (base, name)
  }

  def streamUpsertSteady(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    val (base, name) = cloneWarmIndex(spark, dir, "graft-streamsteady-idx")
    val (staged, schema) = stageBatches(spark, dir)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = start(stream, base, name)
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_upsert_steady", q)
    } finally { q.stop() }
    IndexCatalog.load(spark, base, name)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  private def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit =
    graft.sources.Maintenance.copyTree(from, to)

  val streamUpsertSql: String =
    """WITH all_b AS (
      |  SELECT vec_id, label, 0 AS version FROM embeddings
      |  UNION ALL
      |  SELECT vec_id, label + 100 AS label, 1 AS version
      |  FROM embeddings WHERE vec_id % 101 = 0
      |  UNION ALL
      |  SELECT vec_id, label + 200 AS label, 2 AS version
      |  FROM embeddings WHERE vec_id % 202 = 0
      |  UNION ALL
      |  SELECT vec_id, label + 150 AS label, 2 AS version
      |  FROM embeddings WHERE vec_id % 103 = 0 AND vec_id % 202 != 0
      |  UNION ALL
      |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
      |    label, 2 AS version
      |  FROM embeddings WHERE vec_id % 97 = 0),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY version DESC) AS rn
      |      FROM all_b)
      |SELECT vec_id, label FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** The q_stream_knn query workload: two micro-batches of three query
    * ids each — the ids are shared between the replay and the oracle. */
  private val StreamKnnBatch1 = Seq(0L, 7L, 13L)
  private val StreamKnnBatch2 = Seq(21L, 34L, 55L)

  /** Q-stream-knn: STREAMING VECTOR SEARCH SERVING — the reference's
    * query REPL (`main.go:190-213`: read a query, search, loop) as a
    * stream: query vectors ARRIVE as an unbounded stream and each
    * micro-batch is served against the static index with the SAME
    * [[graft.operators.KnnSearch.knnJoin]] operator every batch API uses
    * (per-query top-3, WindowGroupLimit). The serving loop is
    * `foreachBatch` — the production shape for micro-batched model/index
    * serving: full batch semantics inside the hook (ranking windows are
    * not otherwise available to an append-mode stream), append-only
    * result log out. Each query id arrives exactly once, so per-batch
    * ranking is complete per query and the final log equals the one-shot
    * batch kNN join over all queries — which is exactly what the oracle
    * states.
    *
    * Scale shape: the stream side is tiny per trigger (a serving batch);
    * the static side re-plans per micro-batch against the CURRENT index
    * files — compose with the persisted probed layout
    * (IndexCatalog.loadBuckets per query, the q_ann_batch shape) when the
    * corpus outgrows brute scoring; brute here keeps the oracle exact. */
  def streamKnn(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.operators.KnnSearch
    import graft.Tables
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val staged = graft.Scratch.dir("graft-streamknn-in")
    def queryBatch(ids: Seq[Long]) = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    queryBatch(StreamKnnBatch1).coalesce(1).write.mode("overwrite").parquet(staged)
    DocStream.stampAscendingMtimes(staged)
    queryBatch(StreamKnnBatch2).coalesce(1).write.mode("append").parquet(staged)
    val outPath = graft.Scratch.dir("graft-streamknn-out") + "/hits"
    val ckpt = graft.Scratch.dir("graft-streamknn-ck")
    val stream = spark.readStream.schema(queryBatch(StreamKnnBatch1).schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // deterministic under retries: the per-batch result depends only
        // on (batch queries, static index), so a replayed micro-batch
        // appends identical rows and the overwrite-by-rerun Verify/Bench
        // lifecycle stays idempotent (fresh scratch out dir per run)
        KnnSearch.knnJoin(emb, batch, k = 3)
          .write.mode("append").parquet(outPath)
      }
      .start()
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_knn", q)
    } finally { q.stop() }
    spark.read.parquet(outPath)
      .orderBy(col("query_id"), col("rank"))
  }

  val streamKnnSql: String = {
    import graft.operators.VectorSql.{cosine => cos}
    val ids = (StreamKnnBatch1 ++ StreamKnnBatch2).mkString(", ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |           WHERE vec_id IN ($ids)),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, e.label,
       |         ROUND(${cos("e.embedding", "qe")}, 6) AS score
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, vec_id, label, score, rank FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Q-stream-cdc: CHANGELOG APPLY — a CDC stream (`op` ∈ {U, D} with a
    * per-key version, the Debezium/lakehouse merge shape) maintained
    * against the persisted index. Each micro-batch resolves per-key to
    * its HIGHEST-version operation ([[Upsert.lastWriteWins]] — a key's
    * stale op inside the batch never applies), then splits: upserts merge
    * via the version-aware [[IndexCatalog.upsertInto]], deletes append
    * via [[IndexCatalog.tombstone]] — so a delete costs O(|keys|) on the
    * hot path and searches stop seeing the keys at the NEXT trigger,
    * while the physical fold waits for the epilogue's
    * [[IndexCatalog.vacuumTombstones]].
    *
    * The staged lifecycle exercises every CDC transition: update (v1
    * relabel), delete (v1), update-then-delete across batches (v1 upsert,
    * v2 delete — the later op wins), and DELETE-THEN-REUPSERT (v1 delete,
    * v2 upsert — upsertInto's tombstone-clearing revival path, the
    * IndexDeleteSpec semantics under streamed delivery). Cross-batch
    * redelivery safety is symmetric since round 11: upserts are
    * version-safe (the stored version wins the merge window) AND deletes
    * are VERSIONED tombstones ((key, MAX batch version) on disk, hiding
    * only rows their version covers) — a redelivered stale op of either
    * kind is inert, which [[streamCdcOoo]] exercises end-to-end with a
    * deliberately out-of-order third batch.
    *
    * The oracle states the flat end-state per key class — no replay of
    * the machinery, just what the index must contain. */
  def streamCdc(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val emb = Tables.embeddings(spark, dir)
    // warm initial state shared with q_stream_upsert_steady (one layout
    // definition — cloneWarmIndex)
    val (base, name) = cloneWarmIndex(spark, dir, "graft-streamcdc-idx")
    // batch 1 (v1): relabel %101 keys (minus the %97 overlap — one op per
    // (key, version)); delete %97 keys. batch 2 (v2): delete %202 keys,
    // minus %194 — those REVIVE instead with a fresh payload.
    val staged = graft.Scratch.dir("graft-streamcdc-in")
    val b1 = emb.filter(col("vec_id") % 101 === 0 && col("vec_id") % 97 =!= 0)
      .select(col("vec_id"), col("embedding"),
        (col("label") + 100).as("label"), lit(1L).as("version"), lit("U").as("op"))
      .unionByName(emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id"), col("embedding"),
          col("label"), lit(1L).as("version"), lit("D").as("op")))
    val b2 = emb.filter(col("vec_id") % 202 === 0 && col("vec_id") % 194 =!= 0)
      .select(col("vec_id"), col("embedding"),
        col("label"), lit(2L).as("version"), lit("D").as("op"))
      .unionByName(emb.filter(col("vec_id") % 194 === 0)
        .select(col("vec_id"), col("embedding"),
          (col("label") + 500).as("label"), lit(2L).as("version"), lit("U").as("op")))
    b1.coalesce(1).write.mode("overwrite").parquet(staged)
    DocStream.stampAscendingMtimes(staged)
    b2.coalesce(1).write.mode("append").parquet(staged)
    val dim = IndexCatalog.describe(base, name).get.dimension
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(batch, base, name, dim)
      }
      .start()
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_cdc", q)
    } finally { q.stop() }
    IndexCatalog.vacuumTombstones(spark, base, name)
    IndexCatalog.load(spark, base, name)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** One CDC trigger (shared by q_stream_cdc and q_stream_cdc_ooo):
    * in-batch LWW resolve, then ONE driver action decides both branches —
    * count per op over the checkpointed frame (a short job over cached
    * blocks; the pre-round-11 shape paid two extra jobs per trigger via
    * `ups.isEmpty`/`dels.isEmpty`, and per-trigger scheduling latency is
    * the dominant CDC cost at small batch sizes). Upserts merge
    * version-aware; deletes append a VERSIONED tombstone. */
  private[graft] def applyCdcBatch(batch: DataFrame, base: String, name: String,
                            dim: Int): Unit = {
    val resolved = Upsert.lastWriteWins(batch, Seq("vec_id"), "version",
        tieBreak = Seq(xxhash64(col("embedding"), col("label"), col("op"))))
      .localCheckpoint(true)
    val opCounts = resolved.groupBy(col("op")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (opCounts.collect { case (op, n) if op != "D" => n }.sum > 0) {
      val ups = resolved.filter(col("op") =!= "D").drop("op")
        .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), dim))
      IndexCatalog.upsertInto(batch.sparkSession, base, name,
        ups, "vec_id", versionCol = Some("version"), knownNonEmpty = true)
    }
    if (opCounts.contains("D"))
      IndexCatalog.tombstone(batch.sparkSession, base, name,
        resolved.filter(col("op") === "D").select(col("vec_id"), col("version")),
        versionCol = Some("version"))
  }

  val streamCdcSql: String =
    """SELECT vec_id,
      |  CASE WHEN vec_id % 194 = 0 THEN label + 500
      |       WHEN vec_id % 101 = 0 THEN label + 100
      |       ELSE label END AS label
      |FROM embeddings
      |WHERE NOT ((vec_id % 97 = 0 AND vec_id % 194 <> 0)
      |        OR (vec_id % 202 = 0 AND vec_id % 194 <> 0))
      |ORDER BY vec_id""".stripMargin

  /** Q-stream-cdc-ooo: CDC REDELIVERY SAFETY, end-to-end — the same
    * changelog-apply machinery as q_stream_cdc fed a deliberately
    * OUT-OF-ORDER delivery: after the v2 updates/deletes and the v3
    * revivals, a third batch REDELIVERS STALE v1 ops — a v1 DELETE of the
    * keys just revived at v3, and a v1 relabel of keys already updated to
    * v2. Both must be inert: the versioned tombstone hides only rows its
    * version covers (v1 < v3 → the revived rows stay visible), and the
    * version-aware merge keeps the higher stored version (v2 beats the
    * stale v1 payload). An at-least-once CDC source (every real one)
    * redelivers exactly like this; the pre-round-11 key-set tombstone
    * would have silently re-hidden the revived keys. The oracle states
    * the end state the IN-ORDER prefix alone would produce — redelivery
    * changing nothing IS the property under test. */
  def streamCdcOoo(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val emb = Tables.embeddings(spark, dir)
    val (base, name) = cloneWarmIndex(spark, dir, "graft-streamcdcooo-idx")
    val staged = graft.Scratch.dir("graft-streamcdcooo-in")
    val b1 = emb.filter(col("vec_id") % 101 === 0 && col("vec_id") % 97 =!= 0)
      .select(col("vec_id"), col("embedding"),
        (col("label") + 100).as("label"), lit(2L).as("version"), lit("U").as("op"))
      .unionByName(emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id"), col("embedding"),
          col("label"), lit(2L).as("version"), lit("D").as("op")))
    val b2 = emb.filter(col("vec_id") % 194 === 0)
      .select(col("vec_id"), col("embedding"),
        (col("label") + 500).as("label"), lit(3L).as("version"), lit("U").as("op"))
    // the stale redelivery: v1 ops that in-order delivery applied (and
    // superseded) long ago
    val b3 = emb.filter(col("vec_id") % 194 === 0)
      .select(col("vec_id"), col("embedding"),
        col("label"), lit(1L).as("version"), lit("D").as("op"))
      .unionByName(emb.filter(col("vec_id") % 101 === 0 && col("vec_id") % 97 =!= 0)
        .select(col("vec_id"), col("embedding"),
          (col("label") + 900).as("label"), lit(1L).as("version"), lit("U").as("op")))
    stageOrdered(staged, Seq(b1, b2, b3))
    val dim = IndexCatalog.describe(base, name).get.dimension
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(batch, base, name, dim)
      }
      .start()
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_cdc_ooo", q)
    } finally { q.stop() }
    IndexCatalog.vacuumTombstones(spark, base, name)
    IndexCatalog.load(spark, base, name)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** Stage batches as ORDER-CARRYING stream files: each batch's single
    * part file is renamed `part-bNNNN.parquet` so the name order IS the
    * delivery order, then mtimes are stamped ascending in name order
    * (FileStreamSource delivers oldest-first; two appends in the same
    * millisecond would otherwise tie-break arbitrarily). */
  private def stageOrdered(staged: String,
                           batches: Seq[DataFrame]): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    Files.createDirectories(Paths.get(staged))
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = staged + s".b$i"
      b.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = scala.util.Using.resource(Files.list(Paths.get(tmp))) { s =>
        s.iterator().asScala
          .find(_.getFileName.toString.startsWith("part-")).get
      }
      Files.move(part, Paths.get(staged, f"part-b$i%04d.parquet"))
      graft.sources.Maintenance.deleteRecursively(Paths.get(tmp))
    }
    DocStream.stampAscendingMtimes(staged)
  }

  /** The in-order prefix's end state — identical to what q_stream_cdc's
    * oracle states for its own key classes: stale redelivered ops must
    * leave no trace. */
  val streamCdcOooSql: String =
    """SELECT vec_id,
      |  CASE WHEN vec_id % 194 = 0 THEN label + 500
      |       WHEN vec_id % 101 = 0 THEN label + 100
      |       ELSE label END AS label
      |FROM embeddings
      |WHERE NOT (vec_id % 97 = 0 AND vec_id % 194 <> 0)
      |ORDER BY vec_id""".stripMargin

  /** Q-stream-ann: STREAMING PROBED-ANN SERVING — the q_stream_knn
    * serving loop upgraded from brute scoring to the PERSISTED
    * bucket-partitioned index: per micro-batch, each arriving query's
    * nprobe=4 probe set is selected against the cached centroid table
    * (nprobe integers through the driver per query — the IVF serving
    * discipline), the probe UNION prunes the index scan to its bucket
    * directories (`loadBuckets` → PartitionFilters), and the broadcast
    * per-(query, bucket) probe table restricts each query to ITS probes
    * before the WindowGroupLimit rank — the q_ann_batch amortization
    * shape, re-planned per trigger against the CURRENT index files.
    * Every query id arrives exactly once, so the appended result log
    * equals the one-shot batched probed search — which is what the
    * oracle states (q_ann_batch's replay). This is the shape SCALE.md's
    * q_stream_knn row names as the corpus-scale path: stream side tiny
    * per trigger, static side partition-pruned, nothing corpus-sized
    * broadcast. */
  def streamAnn(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.operators.{KnnSearch, VectorOps}
    import graft.Tables
    import org.apache.spark.sql.expressions.Window
    val (base, name, cent) = VectorOps.ensureIvfBucketed(spark, dir)
    val centCk = cent.localCheckpoint(true) // 16 rows, reused per trigger
    val staged = graft.Scratch.dir("graft-streamann-in")
    def queryBatch(ids: Seq[Long]) = Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    queryBatch(Seq(0L, 7L)).coalesce(1).write.mode("overwrite").parquet(staged)
    DocStream.stampAscendingMtimes(staged)
    queryBatch(Seq(13L)).coalesce(1).write.mode("append").parquet(staged)
    val outPath = graft.Scratch.dir("graft-streamann-out") + "/hits"
    val ckpt = graft.Scratch.dir("graft-streamann-ck")
    val stream = spark.readStream.schema(queryBatch(Seq(0L)).schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        import ss.implicits._
        val qs = KnnSearch.withNorm(batch, "q_embedding")
          .withColumnRenamed("vec_norm", "q_norm").localCheckpoint(true)
        // ALL queries' probe sets from ONE windowed plan + one collect
        // (the annBatch probe shape) — a per-query probes() job would
        // serialize B driver round-trips on the serving hot path
        val pw = Window.partitionBy(col("q_id"))
          .orderBy(col("p_score").desc, col("cent_id"))
        val probePairs = centCk.crossJoin(broadcast(qs))
          .withColumn("p_score", graft.functions.VectorFunctions.cosineSimPrenormed(
            graft.functions.VectorFunctions.dotProduct(col("c_embedding"), col("q_embedding")),
            col("c_norm"), col("q_norm")))
          .withColumn("pr", row_number().over(pw))
          .filter(col("pr") <= 4)
          .select(col("q_id"), col("cent_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        if (probePairs.nonEmpty) {
          val probeDf = probePairs.toDF("q_id", "cent_id")
          val rw = Window.partitionBy(col("q_id"))
            .orderBy(col("score").desc, col("vec_id"))
          IndexCatalog.loadBuckets(ss, base, name, probePairs.map(_._2).distinct)
            .withColumn("cent_id", col("bucket").cast("long"))
            .join(broadcast(probeDf), Seq("cent_id"))
            .join(broadcast(qs), Seq("q_id"))
            .filter(col("vec_id") =!= col("q_id"))
            .withColumn("score", KnnSearch.prenormedScore)
            .withColumn("rank", row_number().over(rw))
            .filter(col("rank") <= 10)
            .select(col("q_id"), col("rank"), col("vec_id"), col("label"),
              col("cent_id"), col("score"))
            .write.mode("append").parquet(outPath)
        }
      }
      .start()
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_ann", q)
    } finally { q.stop() }
    spark.read.parquet(outPath).orderBy(col("q_id"), col("rank"))
  }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q_stream_upsert" -> (streamUpsert _),
      "q_stream_upsert_steady" -> (streamUpsertSteady _),
      "q_stream_cdc" -> (streamCdc _),
      "q_stream_cdc_ooo" -> (streamCdcOoo _),
      "q_stream_ann" -> (streamAnn _),
      "q_stream_knn" -> (streamKnn _))

  def oracles: Map[String, String] =
    Map("q_stream_upsert" -> streamUpsertSql,
      // identical final LWW state through the warm-index lifecycle
      "q_stream_upsert_steady" -> streamUpsertSql,
      "q_stream_cdc" -> streamCdcSql,
      "q_stream_cdc_ooo" -> streamCdcOooSql,
      // the streamed probed serving log must equal the one-shot batched
      // probed search — same probes, same ranks, different delivery
      "q_stream_ann" -> graft.operators.VectorOps.annBatchSql,
      "q_stream_knn" -> streamKnnSql)
}
