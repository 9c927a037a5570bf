package graft.sources

import java.nio.file.{Files, Paths}

import graft.Tables
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted INVERTED INDEX for keyword retrieval — the lexical twin of
  * the persisted IVF layout (`IndexCatalog`): where the vector index
  * partitions by centroid bucket so a query reads nprobe directories,
  * the text index partitions posting lists by a TERM-HASH bucket so a
  * query reads only the directories its terms hash into. q_bm25 computes
  * df/N/avgdl from the corpus at query time (one full tokenize pass per
  * query); q_bm25_indexed pays that pass ONCE at build and serves every
  * later query from |query terms| bucket directories — identical results
  * (same oracle), different access path, exactly the q_ann_ivf →
  * q_ann_ivf_persisted relationship.
  *
  * Layout under `IndexCatalog.cacheBase(dir)/docs-inverted/`:
  *  - `data/tbucket=<b>/` — postings (w, doc_id, tf, dl); dl is
  *    denormalized per posting (immutable per doc), df is NOT — a term's
  *    df changes whenever ANY doc containing it arrives, so denormalizing
  *    df would turn every upsert into a rewrite of every touched term's
  *    full posting list (the reason real engines keep a term dictionary)
  *  - `dict/` — the term dictionary (w, df); term-level, postings-scale
  *    smaller than the data (bucketable by the same term hash when a
  *    100 TB corpus's vocabulary outgrows one shard)
  *  - `stats/` — one row (n, avgdl), the corpus constants
  *  - `_text_index.json` — descriptor, written AFTER the data (the
  *    createIfAbsent killed-build discipline: a half-built index is
  *    invisible and rebuilt on the next call)
  *
  * 100 TB: the build is one tokenize-explode + one (doc, term) count
  * shuffle + the df re-aggregation — corpus-linear, offline, amortized
  * over every query served. A query computes its terms' buckets
  * DRIVER-SIDE (|terms| hashes — metadata, the probe-selection
  * discipline), reads those directories under partition pruning with the
  * term equality pushed to Parquet, and scores |postings of query terms|
  * rows: cost ∝ term selectivity, independent of corpus size. Skewed
  * (stopword-grade) terms concentrate in single buckets — the df-cap /
  * stopword-strip a production build applies first is the same hot-gram
  * discipline the dedup family documents. */
object InvertedIndex {

  /** Term-hash partition fanout. 32 keeps directory count civil at test
    * scale; a 100 TB corpus raises it so each bucket's posting shard
    * stays executor-sized (the shuffle-partition sizing rule applied to
    * layout). */
  val TermBuckets = 32

  val IndexName = "docs-inverted"

  private def marker(base: String) =
    Paths.get(base, IndexName, "_text_index.json")

  private def bucketCol(term: org.apache.spark.sql.Column) =
    pmod(xxhash64(term), lit(TermBuckets.toLong))

  /** The index's on-disk locations. */
  case class Layout(dataPath: String, dictPath: String, statsPath: String)

  /** Postings + doc-length frame for a batch of documents — the one
    * tokenize pipeline build and upsert share (a drift between them would
    * silently corrupt df/tf merges). */
  private def postingsOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).as("dl"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    (tf.join(lens, "doc_id"), lens)
  }

  /** Build the index if absent. */
  def ensure(spark: SparkSession, dir: String): Layout = {
    val base = IndexCatalog.cacheBase(dir)
    val layout = Layout(
      Paths.get(base, IndexName, "data").toString,
      Paths.get(base, IndexName, "dict").toString,
      Paths.get(base, IndexName, "stats").toString)
    if (!Files.exists(marker(base))) {
      Files.createDirectories(Paths.get(base, IndexName))
      val (postings, lens) = postingsOf(Tables.documents(spark, dir))
      // (n, total_dl), NOT (n, avgdl): the average is one double division
      // away, and storing the EXACT integer total is what lets an upsert
      // update the stats incrementally without FP drift (n·avgdl does not
      // round-trip to the exact token total)
      lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("total_dl"))
        .coalesce(1).write.mode("overwrite").parquet(layout.statsPath)
      postings.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .coalesce(1).write.mode("overwrite").parquet(layout.dictPath)
      postings
        .withColumn("tbucket", bucketCol(col("w")))
        // one task per bucket value → one file per partition directory
        // (the createIfAbsent small-files discipline)
        .repartition(col("tbucket"))
        .write.mode("overwrite").partitionBy("tbucket").parquet(layout.dataPath)
      Files.writeString(marker(base),
        s"""{"name": "$IndexName", "kind": "inverted", "buckets": $TermBuckets}""")
    }
    layout
  }

  /** Q-bm25-indexed: BM25 top-10 for the fixed 3-term query, served from
    * the persisted posting lists. Bucket selection is plan-time metadata
    * (|terms| driver-side hashes → a `tbucket IN (...)` PartitionFilter);
    * the per-term/per-doc arithmetic is IDENTICAL to [[TextOps]] q_bm25 —
    * same expression tree, same operand types (tf/df/n LONG, dl INT,
    * avgdl DOUBLE), same fixed-order pivot assembly — so the shared
    * oracle hash-matches both. */
  def bm25Indexed(spark: SparkSession, dir: String): DataFrame =
    bm25Over(spark, ensure(spark, dir))

  /** BM25 top-10 against an arbitrary index layout — shared by the
    * build-then-query path (q_bm25_indexed) and the upsert path
    * (q_bm25_upsert), so both serve through literally the same plan. */
  private[graft] def bm25Over(spark: SparkSession, layout: Layout): DataFrame = {
    val terms = TextOps.Bm25Terms
    import spark.implicits._
    val buckets = terms.toDF("w").select(bucketCol(col("w")).as("b"))
      .distinct().as[Long].collect().toSeq
    val post = spark.read.parquet(layout.dataPath)
      .filter(col("tbucket").isin(buckets: _*) && col("w").isin(terms: _*))
    val dict = spark.read.parquet(layout.dictPath)
      .filter(col("w").isin(terms: _*))
    // avgdl = exact-long total / exact-long count, ONE double division —
    // the same value avg(dl) produces (Spark and DuckDB both sum integer
    // dl exactly and divide once), so oracle parity is preserved
    val stats = spark.read.parquet(layout.statsPath)
      .select(col("n"),
        (col("total_dl").cast("double") / col("n").cast("double")).as("avgdl"))
    post.join(broadcast(dict), "w")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id")).pivot("w", terms).agg(sum(col("s")))
      .select(col("doc_id"),
        round(terms.map(t => coalesce(col(t), lit(0.0))).reduce(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** New-doc derivation for the declared upsert query: the first
    * [[UpsertSrcCount]] docs re-keyed past the id domain by
    * [[UpsertIdOffset]] (the MAX()+1 discipline with a fixed headroom
    * constant — doc_id tops out at 5k on the largest SF) — deterministic,
    * so the oracle replays the same corpus growth as a UNION. */
  val UpsertSrcCount = 10
  val UpsertIdOffset = 1000000L

  /** Incremental DOCUMENT ADD into an existing index — the maintenance
    * path the dict layout exists for. Three moves, each touching only
    * what changed:
    *  - postings: pure APPEND of the new docs' (w, doc_id, tf, dl) rows
    *    into their term-bucket directories — new doc_ids add part files,
    *    zero read-modify-write, I/O ∝ the new batch (REPLACING an
    *    existing doc_id is the partition-rewrite path of
    *    [[IndexCatalog.upsertInto]], not this)
    *  - dict: term-level df merge (full-outer + coalesce-sum) through a
    *    staging directory and swap — never read-and-overwrite (the
    *    rebuildIvf discipline); this single term-level rewrite is exactly
    *    the cost denormalizing df would multiply onto every posting
    *  - stats: exact-integer increments (n += Δn, total_dl += Δdl) —
    *    no FP drift, so an upserted index serves the SAME avgdl a fresh
    *    build over the grown corpus would
    * At 100 TB the dict rewrite shards by the same term hash as the
    * postings; everything else is already new-batch-proportional. */
  def upsertDocs(spark: SparkSession, layout: Layout, docs: DataFrame): Unit = {
    val (postings, lens) = postingsOf(docs)
    val newPost = postings.withColumn("tbucket", bucketCol(col("w")))
      .localCheckpoint(eager = true) // consumed twice: data append + df delta
    newPost.repartition(col("tbucket"))
      .write.mode("append").partitionBy("tbucket").parquet(layout.dataPath)
    val delta = newPost.groupBy(col("w")).agg(count(lit(1)).as("ddf"))
    val mergedDict = spark.read.parquet(layout.dictPath)
      .join(delta, Seq("w"), "full_outer")
      .select(col("w"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("ddf"), lit(0L))).as("df"))
    stagedSwap(mergedDict.coalesce(1), layout.dictPath)
    val d = lens.agg(count(lit(1)).as("dn"), sum(col("dl")).as("ddl")).head()
    val mergedStats = spark.read.parquet(layout.statsPath)
      .select((col("n") + d.getLong(0)).as("n"),
        (col("total_dl") + d.getLong(1)).as("total_dl"))
    stagedSwap(mergedStats.coalesce(1), layout.statsPath)
  }

  /** Write `df` beside `destPath`, then swap directories — the reader
    * never sees a half-written table and the writer never reads the path
    * it is overwriting. */
  private def stagedSwap(df: DataFrame, destPath: String): Unit = {
    val tmp = destPath + ".staged"
    df.write.mode("overwrite").parquet(tmp)
    Maintenance.deleteRecursively(Paths.get(destPath))
    Files.move(Paths.get(tmp), Paths.get(destPath))
  }

  /** Q-bm25-upsert: index MAINTENANCE end-to-end — clone the shared
    * cached index (a lifecycle query must leave the cache untouched and
    * stay re-runnable: the q_stream_upsert discipline), add
    * [[UpsertSrcCount]] new documents via [[upsertDocs]], and serve the
    * same fixed BM25 query from the grown index through literally the
    * same plan as q_bm25_indexed ([[bm25Over]]). The oracle rebuilds
    * from scratch over the grown corpus — incremental maintenance and
    * full rebuild must agree bit-for-bit (df, n, and avgdl all shift
    * with the new docs, so a stale or drifting stat fails the hash). */
  def bm25Upsert(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    val cloneRoot = Paths.get(graft.Scratch.dir("bm25-upsert"))
    Maintenance.copyTree(Paths.get(IndexCatalog.cacheBase(dir), IndexName), cloneRoot)
    val layout = Layout(
      cloneRoot.resolve("data").toString,
      cloneRoot.resolve("dict").toString,
      cloneRoot.resolve("stats").toString)
    val newDocs = Tables.documents(spark, dir)
      .filter(col("doc_id") < UpsertSrcCount)
      .select((col("doc_id") + UpsertIdOffset).as("doc_id"), col("text"))
    upsertDocs(spark, layout, newDocs)
    bm25Over(spark, layout)
  }

  // the oracle replays the grown corpus as a UNION and re-derives every
  // statistic from scratch — the strongest form of the "incremental ==
  // rebuild" claim
  val bm25UpsertSql: String = TextOps.bm25Sql
    .replace("WITH toks AS",
      s"WITH d2 AS (SELECT doc_id, text FROM documents UNION ALL " +
        s"SELECT doc_id + $UpsertIdOffset AS doc_id, text FROM documents " +
        s"WHERE doc_id < $UpsertSrcCount),\ntoks AS")
    .replace("FROM documents)", "FROM d2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25_indexed" -> (bm25Indexed _),
    "q_bm25_upsert" -> (bm25Upsert _))

  // q_bm25_indexed: same oracle as q_bm25 — the persisted term-bucketed
  // layout changes the access path (partition pruning), never the result
  def oracles: Map[String, String] = Map(
    "q_bm25_indexed" -> TextOps.bm25Sql,
    "q_bm25_upsert" -> bm25UpsertSql)
}
