package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is declared here as a named query over
  * the testdata tables; for each, `oracleSql` carries the equivalent ANSI
  * SQL that DuckDB runs on the same parquet files (omitted only for
  * operators whose semantics are not SQL-expressible — those get the
  * driver's weaker rows-only check and a ScalaTest spec instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's full pipeline in one plan: normalize + embed the
    * corpus (`embed/embed.go`), score against an embedded text query,
    * top-K, and fetch-join matches back to their stored text
    * (`main.go:89-184`, with bug B3's lost enrichment fixed). */
  def entry(spark: SparkSession): DataFrame =
    EmbedOps.embedKnn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ VectorOps.queries ++ IvfTune.queries ++ LshTune.queries ++ PqTune.queries ++ IvfPqTune.queries ++ FusionTune.queries ++ TextOps.queries ++ EventOps.queries ++ DedupOps.queries ++ EmbedOps.queries ++ MultimodalOps.queries ++ AsofJoin.queries ++ RandomHyperplaneLsh.queries ++ RangeJoin.queries ++ CorpusOps.queries ++ PipelineOps.queries ++ GraphOps.queries ++ PqIndex.queries ++ ReconcileOps.queries ++ EmbedAnalytics.queries ++ EmbedPca.queries ++ DataContract.queries ++ graft.sources.FormatRoundtrip.queries ++ graft.sources.InvertedIndex.queries ++ graft.sources.EmbedIndex.queries ++ graft.sources.MinhashIndex.queries ++ graft.sources.IncrementalAudit.queries ++ graft.streaming.AllCdc.queries ++ graft.streaming.DocStream.queries ++ graft.streaming.EventsStream.queries ++ graft.streaming.VectorStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ VectorOps.oracles ++ IvfTune.oracles ++ LshTune.oracles ++ PqTune.oracles ++ IvfPqTune.oracles ++ FusionTune.oracles ++ TextOps.oracles ++ EventOps.oracles ++ DedupOps.oracles ++ EmbedOps.oracles ++ MultimodalOps.oracles ++ AsofJoin.oracles ++ RandomHyperplaneLsh.oracles ++ RangeJoin.oracles ++ CorpusOps.oracles ++ PipelineOps.oracles ++ GraphOps.oracles ++ PqIndex.oracles ++ ReconcileOps.oracles ++ EmbedAnalytics.oracles ++ EmbedPca.oracles ++ DataContract.oracles ++ graft.sources.FormatRoundtrip.oracles ++ graft.sources.InvertedIndex.oracles ++ graft.sources.EmbedIndex.oracles ++ graft.sources.MinhashIndex.oracles ++ graft.sources.IncrementalAudit.oracles ++ graft.streaming.AllCdc.oracles ++ graft.streaming.DocStream.oracles ++ graft.streaming.EventsStream.oracles ++ graft.streaming.VectorStream.oracles
}
