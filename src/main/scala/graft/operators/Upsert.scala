package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / merge-by-key (SURVEY.md §2.1 S5).
  *
  * The reference's "upsert" is Pinecone last-write-wins by vector id
  * (`upsert/upsert.go:170`: ids are `vector_id_<lineNumber>`, so re-runs
  * overwrite silently). Here the write order is an explicit, deterministic
  * `version` column (batch id) rather than file order — SURVEY.md §7.3.
  *
  * Scale: one shuffle on the key columns (the ranking window's partition
  * key); with AQE the skewed-key case splits automatically. For a
  * petabyte-scale index the same operator applies per storage partition
  * (partitioned overwrite), never globally.
  */
object Upsert {

  /** Keep, per key, the single row with the highest version (ties broken by
    * the later batch winning is undefined in the reference; we make version
    * strictly ordered so there are none). `tieBreak` columns order rows
    * WITHIN an equal version deterministically — required wherever the
    * caller's idempotency contract (e.g. a streaming sink retry) must pick
    * the same winner on every evaluation even if an at-least-once upstream
    * duplicated a (key, version) with different payloads. */
  def lastWriteWins(batches: DataFrame, keys: Seq[String], versionCol: String,
                    tieBreak: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc +: tieBreak: _*)
    batches
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
