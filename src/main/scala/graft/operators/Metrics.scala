package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability (SURVEY.md §2.1 S9 + §2.4 A1/A2).
  *
  * The reference self-verifies with per-run counters — linesProcessed /
  * parseFailures / successes printed to stdout and an err.log
  * (`embed/embed.go:63-64`, `130-131`; `upsert/upsert.go:150-152`,
  * `206-207`). The Spark-native form is `Dataset.observe`: accumulator-
  * backed aggregates collected as a side effect of whatever action runs
  * the plan — zero extra passes over the data, works identically under
  * batch and streaming, and at 100 TB costs one tiny driver-side merge
  * instead of a second scan.
  */
object Metrics {

  /** Attach the reference's ingest counters to a documents-shaped frame.
    * Read them from the returned Observation after an action:
    * `lines_processed == parse_ok + parse_failures` is the reconciliation
    * invariant the reference prints (`embed/embed.go:130-131`). */
  def observeParse(df: DataFrame, textCol: String = "text"): (DataFrame, Observation) = {
    val obs = Observation("parse_counters")
    // null-safe: a NULL text makes the prefix predicate NULL, which
    // both when() branches would skip — processed would exceed ok +
    // failures, silently breaking the documented invariant. NULL counts
    // as a parse failure and as an empty line.
    val ok = coalesce(TextFunctions.hasChatPrefix(col(textCol)), lit(false))
    val observed = df.observe(obs,
      count(lit(1)).as("lines_processed"),
      count(when(ok, 1)).as("parse_ok"),
      count(when(!ok, 1)).as("parse_failures"),
      count(when(coalesce(length(col(textCol)) === 0, lit(true)), 1)).as("empty_lines"))
    (observed, obs)
  }

  /** Upsert counters (`upsert/upsert.go:150-152`): rows seen per batch and
    * rows surviving the merge are observable on either side of
    * [[Upsert.lastWriteWins]]. */
  def observeCount(df: DataFrame, name: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, count(lit(1)).as("rows")), obs)
  }
}
