package graft.sources

import java.nio.file.{Files, Paths}

import graft.operators.KnnSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index DDL + catalog (SURVEY.md §2.1 S7/S8).
  *
  * The reference's index lifecycle is Pinecone HTTP DDL: GET the index,
  * POST `{name, dimension, metric}` if absent (`upsert/upsert.go:38-111`),
  * list via the controller API (`debug-commands.txt:1-3`), stats via
  * `describe_index_stats` (`debug-commands.txt:10-12`). Here an index is a
  * directory: a JSON descriptor + a Parquet table partitioned by
  * `label` (the namespace analog — queries against one namespace prune to
  * its partition directories), with the per-vector L2 norm materialized at
  * build time so searches pay one dot product per scored pair.
  */
object IndexCatalog {

  case class IndexDescriptor(name: String, dimension: Int, metric: String)

  private def descPath(basePath: String, name: String) =
    Paths.get(basePath, name, "_index.json")

  def exists(basePath: String, name: String): Boolean =
    Files.exists(descPath(basePath, name))

  /** Create-if-absent (idempotent, like the reference's GET-then-POST):
    * persists the descriptor and writes `data` partitioned by namespace
    * with precomputed norms. Returns true if it created the index. */
  def createIfAbsent(spark: SparkSession, basePath: String,
                     desc: IndexDescriptor, data: DataFrame): Boolean = {
    // validate at creation (like the reference's DDL, upsert/upsert.go:27)
    // — persisting an unknown metric would make every later search() throw
    // against an index that can only be fixed by manual file surgery
    require(KnnSearch.Metrics.contains(desc.metric),
      s"unknown metric '${desc.metric}' (expected one of ${KnnSearch.Metrics.mkString(", ")})")
    if (exists(basePath, name = desc.name)) return false
    val dir = Paths.get(basePath, desc.name)
    Files.createDirectories(dir)
    KnnSearch.withNorm(data)
      .write.mode("overwrite").partitionBy("label")
      .parquet(dir.resolve("data").toString)
    Files.writeString(descPath(basePath, desc.name),
      s"""{"name": "${desc.name}", "dimension": ${desc.dimension}, "metric": "${desc.metric}"}""")
    true
  }

  /** Descriptor read-back (the GET half of the reference's DDL,
    * `upsert/upsert.go:40-58`). */
  def describe(basePath: String, name: String): Option[IndexDescriptor] = {
    if (!exists(basePath, name)) return None
    val json = Files.readString(descPath(basePath, name))
    def field(k: String) = s""""$k":\\s*"?([^",}]+)"?""".r
      .findFirstMatchIn(json).map(_.group(1))
    for {
      n <- field("name"); d <- field("dimension"); m <- field("metric")
    } yield IndexDescriptor(n, d.trim.toInt, m)
  }

  /** Catalog listing (`debug-commands.txt:1-3`). */
  def list(basePath: String): Seq[String] = {
    val base = Paths.get(basePath)
    if (!Files.exists(base)) return Seq.empty
    val s = Files.list(base)
    try s.iterator().asScala
      .filter(p => Files.exists(p.resolve("_index.json")))
      .map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  def load(spark: SparkSession, basePath: String, name: String): DataFrame =
    spark.read.parquet(Paths.get(basePath, name, "data").toString)

  /** Top-K search against a cataloged index under ITS declared metric —
    * the reference stores the metric in the index descriptor
    * (`upsert/upsert.go:27`) and every query inherits it; the caller never
    * re-specifies (or contradicts) it at query time. */
  def search(spark: SparkSession, basePath: String, name: String,
             query: DataFrame, k: Int): DataFrame = {
    val desc = describe(basePath, name).getOrElse(
      throw new IllegalArgumentException(s"no such index: $name"))
    require(KnnSearch.Metrics.contains(desc.metric),
      s"index '$name' declares unknown metric '${desc.metric}'")
    KnnSearch.topK(load(spark, basePath, name), query, k, desc.metric)
  }

  /** `describe_index_stats` (`debug-commands.txt:10-12`): vector counts per
    * namespace — partition pruning makes this a metadata-sized scan. */
  def describeStats(spark: SparkSession, basePath: String, name: String): DataFrame =
    load(spark, basePath, name)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("label"))

  private implicit class IterOps[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
