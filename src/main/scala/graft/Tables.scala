package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the testdata parquet tables (see TESTDATA.md).
  *
  * The reference smears its one logical table across a text file, a CSV
  * file, and a Pinecone index (reference `main.go:32`, `embed/embed.go:68`,
  * `upsert/upsert.go:23`); here every table is a partition-friendly
  * Parquet-backed DataFrame and all operators are `DataFrame => DataFrame`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all tables as temp views named after themselves. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** `events.ts` is TIMESTAMP(NANOS) in the parquet, which Spark 4 refuses
    * to read as a timestamp. Read it as raw nanos (legacy conf) and convert
    * with integer division — nanos (~1.7e18) exceed double's 2^53 exact
    * range, so this must never go through a float. The testdata carries only
    * microsecond precision, so the truncation is lossless and matches
    * DuckDB's native TIMESTAMP_NS handling.
    *
    * NOTE: `nanosAsLong` is a SESSION-wide conf (no per-read option
    * exists) — setting it here also affects any other TIMESTAMP(NANOS)
    * parquet read in the same session, which would then surface as LONG
    * nanos instead of failing. The graft sessions (Sessions.local,
    * Verify, Bench) set it once at construction; this set is kept so
    * user-supplied sessions work, and is idempotent. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
}
