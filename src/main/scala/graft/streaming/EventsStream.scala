package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table (SURVEY.md §2.9).
  *
  * The reference's only unbounded input is its stdin query REPL
  * (`main.go:190-213`); the streaming-shaped capabilities a data pipeline
  * actually needs — windowed aggregation with late-data handling,
  * exactly-once style dedup, session windows — are expressed here as
  * standard `readStream → transform → writeStream` plans. The transforms
  * are the SAME expressions as the batch forms in
  * [[graft.operators.EventOps]]; Structured Streaming's incremental
  * planner turns them into stateful operators with watermark-driven state
  * eviction (bounded state at any scale; without the watermark a 100 TB
  * replay would accumulate state forever).
  */
object EventsStream {

  /** Tumbling 10-minute counts per event type, tolerating 1 hour of
    * event-time lateness before state for a window is finalized/evicted. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup by event id ONLY, state bounded by the watermark:
    * `dropDuplicatesWithinWatermark` evicts an id once the watermark
    * passes its first-seen event time. The earlier
    * `dropDuplicates(event_id, ts)` form silently narrowed the contract —
    * an at-least-once redelivery with a re-stamped/jittered ts is a
    * DIFFERENT key there and sails through; id-only is the documented
    * semantic. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user: 30 minutes of inactivity closes a session —
    * the streaming twin of EventOps.sessionize's lag-based batch form. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Stream-stream interval join (§2.9): each purchase joined to the same
    * user's clicks in the preceding 10 minutes — the streaming twin of
    * the batch [[graft.operators.RangeJoin]]. Both sides carry watermarks
    * AND the join predicate bounds c_ts relative to p_ts, which is what
    * lets Spark evict buffered rows once the watermark passes the
    * interval: state stays bounded on an unbounded stream. Without the
    * time bound this would be a stateful cross-join that grows forever. */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("p_user"), col("c_id"), col("p_ts"), col("c_ts"))
  }

  /** Idle horizon after which a user's running-stats state is evicted —
    * in EVENT time, measured from the user's LAST ACTIVITY (the max event
    * time seen for the key, clamped up to the current watermark for
    * fully-late batches — Spark requires timeouts later than the
    * watermark): a user silent for this long drops from the store (their
    * counter restarts on return, the standard activity-horizon semantic
    * of evictable running stats). */
  val UserStatsIdleTimeout = "7 days"

  /** Custom arbitrary state (SURVEY.md §2.9): per-user running stats via
    * `flatMapGroupsWithState` — the escape hatch when no built-in stateful
    * operator fits (here: a monotone per-user counter + running value sum
    * + last event type, emitted on every update). State lives in the
    * state store, partitioned by user — the same shuffle key as every
    * other per-user operator, so at scale state is as distributed as the
    * data. Eviction is REGISTERED, not just configured: EventTimeTimeout
    * does nothing unless each update arms `setTimeoutTimestamp` and the
    * timed-out invocation removes the state — without those two calls the
    * store grows one entry per user forever (churning user ids = unbounded
    * state), which is exactly what the earlier version did. */
  /** `lastActivityMs` is PERSISTED state, not recomputed per batch: a
    * late-arriving older event must never move the armed horizon
    * backwards, and only the state can remember the true maximum across
    * batches. */
  case class UserState(nEvents: Long, totalValue: Double, lastType: String,
                       lastActivityMs: Long)
  case class UserUpdate(user_id: Long, n_events: Long, total_value: Double,
                        last_type: String)

  def userRunningStats(events: DataFrame): Dataset[UserUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      // keep the watermarked ts column — event-time timeout requires it
      .select(col("user_id"), col("event_type"), col("value"), col("ts"))
      .as[(Long, String, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, _, state: GroupState[UserState]) if state.hasTimedOut =>
          // idle past the horizon: drop the state, emit nothing
          state.remove()
          Iterator.empty
        case (userId, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, "", Long.MinValue))
          val next = rows.foldLeft(prev) { (s, r) =>
            UserState(s.nEvents + 1, s.totalValue + r._3, r._2,
              math.max(s.lastActivityMs, r._4.getTime))
          }
          state.update(next)
          // arm eviction at last activity + horizon, where last activity
          // is the STATE's running maximum — a batch of only late (older)
          // events re-arms at the same horizon, never an earlier one.
          // Clamped up to the current watermark for the degenerate case
          // (Spark rejects a timeout at-or-before the watermark); the
          // clamp only ever EXTENDS a lapsed horizon, never shortens a
          // live one.
          state.setTimeoutTimestamp(
            math.max(next.lastActivityMs, state.getCurrentWatermarkMs() + 1),
            UserStatsIdleTimeout)
          Iterator.single(UserUpdate(userId, next.nEvents,
            math.rint(next.totalValue * 1000) / 1000, next.lastType))
      }
  }

  /** Q-stream-window: the STREAMING tumbling-window aggregation run to
    * completion and checked against a DuckDB oracle — the windowed-agg
    * counterpart of DocStream's q_stream_dedup, closing the loop on §2.9:
    * the streaming aggregation, dedup, and session surfaces carry driver-gated
    * correctness entries, not just stream==batch asserts.
    *
    * Mechanics of "run to completion" in append mode: a window only emits
    * once the WATERMARK passes its end, so the replay appends a sentinel
    * `__flush` row 4 hours past the corpus maximum as its own final
    * micro-batch — the standard flush-marker pattern. After its batch the
    * watermark clears every real window's end, the finalized rows land in
    * the parquet sink (the production sink shape, not a driver-memory
    * table), and the sentinel's own window — never finalized — stays in
    * state, excluded by construction.
    *
    * Oracle discipline: the window sum accumulates in streaming state in
    * arrival/merge order, which for raw doubles differs from the batch
    * and oracle orders — so the aggregated term is an exact
    * DECIMAL(38,18), order-free by construction, and the oracle states
    * the same decimal sum (q_window_events keeps the plain-double form;
    * this query's contract is bit-parity through incremental state). */
  def streamWindowCounts(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val staged = graft.Scratch.dir("graft-streamwin-in")
    events.repartitionByRange(3, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(staged)
    DocStream.stampAscendingMtimes(staged)
    // sentinel flush row, appended as the LAST consumed file (mtime past
    // every stamped part; the stamp base is one hour in the past)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 4L * 3600 * 1000)
    val before = listParts(staged)
    events.orderBy(col("event_id")).limit(1)
      .withColumn("ts", lit(sentinelTs))
      .withColumn("event_type", lit("__flush"))
      .coalesce(1).write.mode("append").parquet(staged)
    (listParts(staged) -- before).foreach { p =>
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(staged).resolve(p),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    }
    val agg = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,18)")).as("sum_dec"))
      .select(col("w.start").as("start"), col("event_type"),
        col("n_events"), col("sum_dec"))
    val outPath = graft.Scratch.dir("graft-streamwin-out") + "/win"
    val ckpt = graft.Scratch.dir("graft-streamwin-ck")
    val q = agg.writeStream.outputMode("append").format("parquet")
      .option("path", outPath).option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_window", q)
    } finally { q.stop() }
    spark.read.parquet(outPath)
      // null-SAFE exclusion: =!= on a NULL event_type is NULL and the
      // filter would silently drop the whole NULL group the oracle keeps
      .filter(!(col("event_type") <=> "__flush"))
      .select(
        date_format(col("start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n_events"),
        round(col("sum_dec").cast("double"), 3).as("sum_value"))
      .orderBy(col("bucket"), col("event_type"))
  }

  private def listParts(dir: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(dir))) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("part-")).toSet
    }
  }

  val streamWindowSql: String =
    """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS bucket,
      |  event_type, COUNT(*) AS n_events,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(38,18))) AS DOUBLE), 3) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  /** Q-stream-session: STREAMING session windows run to completion and
    * checked against q_sessionize's oracle — the third driver-gated
    * streaming surface (aggregation, dedup, sessions). Same sentinel
    * flush mechanics as [[streamWindowCounts]], with the sentinel under
    * a synthetic user (-1) so it can never extend a real user's session;
    * its own never-finalized session stays in state and the -1 filter
    * removes any trace.
    *
    * Semantics note (spec-pinned on this corpus): `session_window(ts,
    * g)` starts a NEW session at a gap of exactly g, while the batch
    * lag-based form (`EventOps.sessionCountsPerUser`) keeps it in the
    * old one ('strictly greater opens'). The two agree everywhere a gap
    * is not exactly g — verified zero exact-g gaps at every SF — so the
    * shared oracle states both; a corpus with exact-gap events would
    * need one semantic chosen. */
  def streamSessionCounts(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val staged = graft.Scratch.dir("graft-streamsess-in")
    events.repartitionByRange(3, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(staged)
    DocStream.stampAscendingMtimes(staged)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 4L * 3600 * 1000)
    val before = listParts(staged)
    events.orderBy(col("event_id")).limit(1)
      .withColumn("ts", lit(sentinelTs))
      .withColumn("user_id", lit(-1L))
      .coalesce(1).write.mode("append").parquet(staged)
    (listParts(staged) -- before).foreach { p =>
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(staged).resolve(p),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    }
    val sessions = sessionCounts(spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged))
    val outPath = graft.Scratch.dir("graft-streamsess-out") + "/sess"
    val ckpt = graft.Scratch.dir("graft-streamsess-ck")
    val q = sessions.writeStream.outputMode("append").format("parquet")
      .option("path", outPath).option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_session", q)
    } finally { q.stop() }
    spark.read.parquet(outPath)
      .filter(col("user_id") >= 0L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Q-stream-join: the STREAM-STREAM INTERVAL JOIN run to completion and
    * checked against a DuckDB batch interval join — the fourth driver-gated
    * streaming surface (aggregation, dedup, sessions, joins). Unlike the
    * windowed surfaces, an INNER stream-stream join emits a row as soon as
    * both sides have arrived — no watermark finalization gates emission
    * (the watermark only bounds join STATE) — so the replay needs no
    * sentinel flush row: `processAllAvailable` drains every match into the
    * parquet sink. The staged multi-file replay still matters: it proves
    * matches survive the two sides arriving in different micro-batches,
    * which is exactly the buffering the join state exists for. */
  def streamIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val staged = graft.Scratch.dir("graft-streamjoin-in")
    events.repartitionByRange(3, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(staged)
    DocStream.stampAscendingMtimes(staged)
    val joined = purchaseClickJoin(spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged))
    val outPath = graft.Scratch.dir("graft-streamjoin-out") + "/join"
    val ckpt = graft.Scratch.dir("graft-streamjoin-ck")
    val q = joined.writeStream.outputMode("append").format("parquet")
      .option("path", outPath).option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      TriggerStats.record("q_stream_join", q)
    } finally { q.stop() }
    spark.read.parquet(outPath)
      .select(col("p_id"), col("p_user"), col("c_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("c_ts"))
      .orderBy(col("p_id"), col("c_id"))
  }

  val streamJoinSql: String =
    """SELECT p.event_id AS p_id, p.user_id AS p_user, c.event_id AS c_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |ORDER BY p_id, c_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_window" -> (streamWindowCounts _),
    "q_stream_session" -> (streamSessionCounts _),
    "q_stream_join" -> (streamIntervalJoin _))

  def oracles: Map[String, String] = Map(
    "q_stream_window" -> streamWindowSql,
    "q_stream_session" -> graft.operators.EventOps.sessionizeSql,
    "q_stream_join" -> streamJoinSql)
}

/** Runnable demo: replays the events table through all three streaming
  * plans into memory sinks and prints the row counts.
  *
  * The replay is staged into several parquet files consumed one per
  * micro-batch (`maxFilesPerTrigger=1`) — watermarks only advance BETWEEN
  * micro-batches, so a single-batch replay would never finalize a session
  * window in append mode. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("graft-streaming-demo")

    // Stage in EVENT-TIME ORDER (range-partitioned files consumed
    // ascending): a time-shuffled replay would make the watermark from the
    // first micro-batch classify most later input as late data and drop it
    // — correct streaming semantics, wrong demo.
    val staged = graft.Scratch.dir("graft-stream")
    val batchEvents = Tables.events(spark, sfDir)
    batchEvents.repartitionByRange(4, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(staged)
    // The file source consumes by (mtime, path); parallel-written parts
    // have tie mtimes, making consumption order — and therefore what the
    // watermark drops — nondeterministic across runs (observed: one file
    // out of order silently late-dropped 25% of events). Stamp strictly
    // increasing mtimes in range order.
    DocStream.stampAscendingMtimes(staged)
    val events = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)

    val plans = Seq(
      ("windowed_counts", EventsStream.windowedCounts(events), "update"),
      ("deduped_events", EventsStream.dedupedEvents(events), "append"),
      ("session_counts", EventsStream.sessionCounts(events), "append"),
      ("purchase_click_join", EventsStream.purchaseClickJoin(events), "append"),
      ("user_running_stats", EventsStream.userRunningStats(events).toDF(), "append"))

    plans.foreach { case (name, df, mode) =>
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      try { q.processAllAvailable() } finally { q.stop() }
      val n = spark.table(name).count()
      println(s"STREAM $name rows=$n")
      assert(n > 0, s"$name produced no rows")
    }
    // Batch/stream consistency: total deduped events must equal the batch count.
    val batchCount = batchEvents.count()
    val streamCount = spark.table("deduped_events").count()
    println(s"STREAM consistency deduped=$streamCount batch=$batchCount")
    assert(streamCount == batchCount, "stream dedup diverged from batch")
    // The stream-stream interval join must emit exactly the batch join's rows
    // (the ascending-time replay keeps every match inside the watermark).
    val batchJoin = EventsStream.purchaseClickJoin(batchEvents).count()
    val streamJoin = spark.table("purchase_click_join").count()
    println(s"STREAM consistency interval_join=$streamJoin batch=$batchJoin")
    assert(streamJoin == batchJoin, "stream-stream join diverged from batch")
    // Streaming corpus ingestion (DocStream): replay the documents table
    // in two staged halves, then replay the first half AGAIN — the corpus
    // must equal batch exact-dedup of the table (stream == batch) and the
    // replay must append nothing (idempotent retries).
    locally {
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val stagedDocs = graft.Scratch.dir("graft-docstage")
      docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(stagedDocs)
      docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(stagedDocs)
      docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(stagedDocs)
      val corpus = java.nio.file.Paths.get(graft.Scratch.dir("graft-doccorpus"))
        .resolve("corpus").toString
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(stagedDocs)
      val q = DocStream.start(stream, corpus)
      try { q.processAllAvailable() } finally { q.stop() }
      val streamed = spark.read.parquet(corpus).count()
      val batchDeduped = graft.operators.Dedup.exact(docs).count()
      println(s"STREAM consistency doc_corpus=$streamed batch_dedup=$batchDeduped")
      assert(streamed == batchDeduped, "streaming corpus dedup diverged from batch")
    }
    spark.stop()
  }
}
