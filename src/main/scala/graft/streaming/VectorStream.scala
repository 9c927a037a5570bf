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
    * Caller starts/stops the returned query. */
  def maintainIndex(stream: DataFrame, basePath: String, name: String,
                    dim: Int): DataStreamWriter[Row] =
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
          .drop("version")
          .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), dim))
          .localCheckpoint(true)
        if (!deduped.isEmpty)
          IndexCatalog.upsertInto(batch.sparkSession, basePath, name,
            deduped, "vec_id")
      }

  /** Convenience: start with a trigger of all available data (used by the
    * spec; production callers pick their own trigger). */
  def start(stream: DataFrame, basePath: String, name: String,
            dim: Int): StreamingQuery =
    maintainIndex(stream, basePath, name, dim).start()
}
