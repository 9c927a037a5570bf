package graft.sources

import java.nio.file.{Files, Paths}

import graft.Tables
import graft.operators.EmbedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED flagship-embedding index — the sparse (doc_id, d, v)
  * relation of [[EmbedOps.embedKnnSqlQuery]] maintained as an index
  * artifact instead of re-derived per query.
  *
  * The observation (SURVEY §7.3, r14 verdict): that relation IS an
  * inverted index with a 16-term integer vocabulary — term = embedding
  * dimension id, tf = the dimension's count. So the artifact is built,
  * upserted, deleted, vacuumed, compacted, repaired, and audited by the
  * [[InvertedIndex]] machinery VERBATIM under the `embed16` tokenizer
  * ([[EmbedOps.embed16Tokenizer]]: whitespace token → polynomial-hash
  * dimension id, the marker-dispatch registry making a mismatched
  * maintenance attach structurally impossible), plus one embed-specific
  * sidecar: per-doc squared norms (`norms/dbucket=<b>/`), because cosine
  * needs every doc's ‖e‖² and a term-partitioned layout cannot answer a
  * per-doc question without a corpus re-aggregation per query
  * ([[InvertedIndex.normsPathOf]] — maintained at build/upsert/vacuum/
  * compact/repair like the lens sidecar).
  *
  * Serving (`q_embed_index`) replays the COMPLETE reference query shape
  * (`main.go:89-184`: embed the query → score the corpus → top-K →
  * fetch-join) with the corpus-side embed pass GONE:
  *  - the query's ≤16 (dimension, count) pairs are computed DRIVER-SIDE
  *    ([[EmbedOps.tokenBucketOf]], bit-parity spec-gated) — request
  *    metadata, no Spark job;
  *  - dot products come from the postings PRUNED to the query
  *    dimensions' term buckets (plan-time `tbucket IN (...)` partition
  *    filters + the `w IN (...)` pushdown) joined to the ≤16-row
  *    broadcast query frame — cost ∝ the matched postings, never the
  *    token stream;
  *  - per-doc norms come from the persisted sidecar (2 longs per doc,
  *    column-pruned) instead of a corpus tokenize-explode;
  *  - scores/top-K/fetch-join are arithmetic-identical to
  *    [[EmbedOps.embedKnnSqlQuery]], so q_embed_index SHARES
  *    q_embed_knn_sql's full DuckDB oracle verbatim — a persisted embed
  *    pass must be invisible in every served value.
  *
  * 100 TB: the build is one tokenize-explode + a (doc, dim) count
  * shuffle — corpus-linear, offline, amortized over every query (the
  * cost q_embed_knn_sql paid PER QUERY, tri-SF 3.60×). A serve touches
  * |query dims| posting buckets + the norms sidecar (a slim two-long
  * relation; a production deployment additionally inner-joins norms to
  * the dot candidates when ≥ k docs matched — zero-dot docs score
  * exactly 0 and are rank-inert — making the norm read candidate-
  * proportional too; the declared query keeps the oracle's left-join
  * shape, which is what guarantees hash parity when FEWER than k docs
  * match). */
object EmbedIndex {

  val IndexName = "docs-embed16"

  def ensure(spark: SparkSession, dir: String): InvertedIndex.Layout =
    InvertedIndex.ensureWith(spark, dir, IndexName, "embed16")

  /** Query-side sparse embedding, driver-side: dimension id → count.
    * The exact integer arithmetic of the corpus side's tokenizer. */
  private[graft] def queryEmbedding(text: String): Map[Long, Long] =
    text.trim.split("\\s+").filter(_.nonEmpty)
      .map(EmbedOps.tokenBucketOf)
      .groupBy(identity).map { case (d, occ) => d -> occ.length.toLong }

  /** Cosine top-k of `queryText` against an embed16 layout — the plan
    * every embed-index query serves through (build-then-query, upsert,
    * lifecycle specs), tombstone-masking like [[InvertedIndex.bm25Over]].
    * Returns (doc_id, score) ordered (score desc, doc_id). */
  private[graft] def embedOver(spark: SparkSession,
                               layout: InvertedIndex.Layout,
                               queryText: String = EmbedOps.FlagshipQuery,
                               k: Int = 5,
                               serving: Boolean = false): DataFrame = {
    import spark.implicits._
    val qemb = queryEmbedding(queryText)
    require(qemb.nonEmpty, "query has no tokens")
    // ‖q‖ as one driver-side IEEE sqrt — the same correctly-rounded
    // double sqrt(CAST(qn2 AS DOUBLE)) both engines' oracles compute
    val sqrtQn2 = math.sqrt(qemb.values.map(v => v * v).sum.toDouble)
    val dTerms = qemb.keys.map(_.toString).toSeq.sorted
    val buckets = InvertedIndex.bucketsOf(dTerms)
    val qdf = qemb.toSeq.sortBy(_._1)
      .map { case (d, v) => (d.toString, v) }.toDF("w", "qv")
    val post0 = spark.read.parquet(layout.dataPath)
      .filter(col("tbucket").isin(buckets: _*) && col("w").isin(dTerms: _*))
    val tombOpt =
      if (InvertedIndex.hasParquet(InvertedIndex.tombDirOf(layout)))
        Some(spark.read.parquet(InvertedIndex.tombDirOf(layout).toString)
          .select(col("doc_id")))
      else None
    def masked(df: DataFrame): DataFrame = tombOpt
      .map(t => df.join(broadcast(t), Seq("doc_id"), "left_anti"))
      .getOrElse(df)
    // Σ_d v_d·q_d per doc: matched postings ⋈ the ≤16-row broadcast
    val dots = masked(post0).join(broadcast(qdf), "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("qv")).as("dot"))
    // ‖e‖² from the persisted sidecar — never a corpus re-aggregation.
    // serving=true pins the norms frame executor-resident through the
    // ServingCache stamp (two longs per doc — the keymap cache's size
    // class applied to the flagship's serve metadata): the per-request
    // listing/footer/scan job over the sidecar is the latency floor,
    // and any upsert/vacuum write to norms moves the stamp before the
    // next request reads it (staleness spec-gated in EmbedIndexSpec)
    val normsStore =
      if (serving) ServingCache.frame(spark,
        Paths.get(InvertedIndex.normsPathOf(layout)))
      else spark.read.parquet(InvertedIndex.normsPathOf(layout))
    val norms = masked(normsStore).select(col("doc_id"), col("n2"))
    norms.join(dots, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("dot"), lit(0L)).cast("double") /
          (sqrt(col("n2").cast("double")) * lit(sqrtQn2)), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The flagship fetch-join epilogue: winners broadcast back against a
    * (doc_id, lang, text) corpus frame — reference bug B3's intended
    * semantics, the J3 shape. */
  private def fetchJoin(top: DataFrame, corpus: DataFrame): DataFrame =
    broadcast(top)
      .join(corpus.select(col("doc_id"), col("lang"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score"),
        substring(col("text"), 1, 80).as("text_head"))
      .orderBy(col("score").desc, col("doc_id"))

  /** Q-embed-index: q_embed_knn_sql served from the PERSISTED artifact —
    * same oracle verbatim, the corpus tokenize-explode replaced by the
    * pruned posting scan + the norms sidecar. */
  def embedKnnIndexed(spark: SparkSession, dir: String): DataFrame =
    fetchJoin(embedOver(spark, ensure(spark, dir)),
      Tables.documents(spark, dir))

  /** Upsert batch for the embed lifecycle: a fixed id range RE-KEYED
    * past the domain ([[InvertedIndex.UpsertIdOffset]]). The range is
    * chosen to CONTAIN a flagship winner (doc 289 ranks #1 at sf0.01),
    * so the incremental path's effect is visible in the declared top-5
    * (the twin enters at the tie-broken rank below its original) — an
    * upsert gate whose result equals the non-upsert result would prove
    * only that the batch was ignored. Cosine scores are per-doc (no
    * corpus statistics), so unlike BM25 the existing docs' scores are
    * growth-invariant; the oracle still re-derives EVERYTHING from the
    * union corpus. */
  val UpsertLo = 286L
  val UpsertHi = 296L

  private def embedTwins(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") >= UpsertLo && col("doc_id") < UpsertHi)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("lang"), col("text"))

  /** Q-embed-index-upsert: incremental ADD into the embed artifact ==
    * a from-scratch rebuild over the grown corpus (the q_bm25_upsert
    * template) — postings append, touched-bucket dict merge, exact stats
    * increments, and the norms-sidecar append all land on the state the
    * oracle re-derives from the union. */
  def embedIndexUpsert(spark: SparkSession, dir: String): DataFrame = {
    val layout = InvertedIndex.cloneIndexNamed(
      spark, dir, IndexName, "embed16", "embed-upsert")
    InvertedIndex.upsertDocs(spark, layout, embedTwins(spark, dir))
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .unionByName(embedTwins(spark, dir))
    fetchJoin(embedOver(spark, layout), corpus)
  }

  // incremental == rebuild, stated the strongest way: the oracle replays
  // the GROWN corpus through the full embed→score→top-K→fetch chain
  val embedIndexUpsertSql: String = EmbedOps.embedKnnSql
    .replace("WITH norm AS",
      s"WITH d2 AS (SELECT doc_id, lang, text FROM documents UNION ALL " +
        s"SELECT doc_id + ${InvertedIndex.UpsertIdOffset} AS doc_id, lang, text " +
        s"FROM documents WHERE doc_id >= $UpsertLo AND doc_id < $UpsertHi),\nnorm AS")
    .replace("FROM documents)", "FROM d2)")

  /** A SECOND query text served from the SHARED artifact — the
    * generality witness (the Bm25Terms2 discipline): the persisted
    * relation answers ANY query through the same driver-hashed-dims →
    * pruned-postings → broadcast plan, not just the hard-wired flagship
    * string. Oracle = the parameterized builder instantiated here. */
  val FlagshipQuery2 = "merge group customer scan"

  def embedKnnIndexedQuery2(spark: SparkSession, dir: String): DataFrame =
    fetchJoin(embedOver(spark, ensure(spark, dir), FlagshipQuery2),
      Tables.documents(spark, dir))

  /** The declared batch block: the flagship, the generality witness, and
    * two more vocabulary phrases — the serving claim needs a BLOCK (the
    * q_graph_ann_batch discipline), not one query. */
  val BatchQueries: Seq[(Int, String)] = Seq(
    0 -> EmbedOps.FlagshipQuery,
    1 -> FlagshipQuery2,
    2 -> "window stream filter spark",
    3 -> "hash join sort data")

  /** BATCHED flagship serve — M query texts through ONE pruned posting
    * scan (the q_ann_batch discipline applied to the embed16 artifact:
    * every other retrieval family already carries its single/batch pair —
    * q_knn/q_knn_join, q_ann_ivf/q_ann_batch, q_graph_ann/
    * q_graph_ann_batch — and the reference's REPL, `main.go:190-213`,
    * is exactly a query stream this amortizes). All M queries' dims hash
    * DRIVER-SIDE into one broadcast (q_id, w, qv, qnorm) frame; the
    * posting scan prunes to the UNION of their tbuckets and is paid once
    * for the block; per-(q_id, doc) dots aggregate map-side; ranking is
    * one window per q_id (WindowGroupLimit). The norms-cross-queries
    * left-join shape keeps score parity with the single-query plan
    * (zero-dot docs score 0 — SCALE.md notes the candidate-proportional
    * inner-join production variant). */
  private[graft] def embedBatchOver(spark: SparkSession,
                                    layout: InvertedIndex.Layout,
                                    queries: Seq[(Int, String)] = BatchQueries,
                                    k: Int = 5): DataFrame = {
    import spark.implicits._
    val qembs = queries.map { case (qid, text) => (qid, queryEmbedding(text)) }
    qembs.foreach { case (qid, m) =>
      require(m.nonEmpty, s"batch query $qid has no tokens") }
    val qRows = qembs.flatMap { case (qid, m) =>
      val qnorm = math.sqrt(m.values.map(v => v * v).sum.toDouble)
      m.toSeq.sortBy(_._1).map { case (d, v) => (qid, d.toString, v, qnorm) }
    }
    val qdf = broadcast(qRows.toDF("q_id", "w", "qv", "qnorm"))
    val dTerms = qRows.map(_._2).distinct.sorted
    val buckets = InvertedIndex.bucketsOf(dTerms)
    val post0 = spark.read.parquet(layout.dataPath)
      .filter(col("tbucket").isin(buckets: _*) && col("w").isin(dTerms: _*))
    val tombOpt =
      if (InvertedIndex.hasParquet(InvertedIndex.tombDirOf(layout)))
        Some(spark.read.parquet(InvertedIndex.tombDirOf(layout).toString)
          .select(col("doc_id")))
      else None
    def masked(df: DataFrame): DataFrame = tombOpt
      .map(t => df.join(broadcast(t), Seq("doc_id"), "left_anti"))
      .getOrElse(df)
    val dots = masked(post0).join(qdf, "w")
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("tf") * col("qv")).as("dot"))
    val qn = broadcast(qembs.map { case (qid, m) =>
      (qid, math.sqrt(m.values.map(v => v * v).sum.toDouble))
    }.toDF("q_id", "qnorm"))
    val norms = masked(spark.read.parquet(InvertedIndex.normsPathOf(layout)))
      .select(col("doc_id"), col("n2"))
    val scored = norms.crossJoin(qn)
      .join(dots, Seq("q_id", "doc_id"), "left")
      .select(col("q_id"), col("doc_id"),
        round(coalesce(col("dot"), lit(0L)).cast("double") /
          (sqrt(col("n2").cast("double")) * col("qnorm")), 6).as("score"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("doc_id"), col("score"))
      .orderBy(col("q_id"), col("score").desc, col("doc_id"))
  }

  /** Q-embed-index-batch: the block served from the shared artifact. */
  def embedIndexBatch(spark: SparkSession, dir: String): DataFrame =
    embedBatchOver(spark, ensure(spark, dir))

  /** The batched oracle: one VALUES table of (q_id, qtext), the corpus
    * embedding chain shared verbatim with [[EmbedOps.embedKnnSqlFor]],
    * per-q_id windows for the ranking. */
  val embedBatchSql: String = {
    val vals = BatchQueries
      .map { case (qid, t) => s"($qid, '$t')" }.mkString(", ")
    s"""WITH norm AS (
       |  SELECT doc_id, lang, text,
       |         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS ntext
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, w FROM
       |    (SELECT doc_id, unnest(string_split(ntext, ' ')) AS w FROM norm)
       |  WHERE w <> ''),
       |hashed AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
       |      (a, c) -> (a * 31 + c) % ${EmbedOps.SqlHashMod}) % ${EmbedOps.SqlEmbedDim} AS d
       |  FROM toks),
       |emb AS (SELECT doc_id, d, COUNT(*) AS v FROM hashed GROUP BY 1, 2),
       |q(q_id, qtext) AS (VALUES $vals),
       |qtok AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS w FROM q),
       |qh AS (
       |  SELECT q_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
       |      (a, c) -> (a * 31 + c) % ${EmbedOps.SqlHashMod}) % ${EmbedOps.SqlEmbedDim} AS d
       |  FROM qtok WHERE w <> ''),
       |qemb AS (SELECT q_id, d, COUNT(*) AS qv FROM qh GROUP BY 1, 2),
       |qn AS (SELECT q_id, SUM(qv * qv) AS qn2 FROM qemb GROUP BY 1),
       |dots AS (SELECT qe.q_id, e.doc_id, SUM(e.v * qe.qv) AS dot
       |         FROM emb e JOIN qemb qe USING (d) GROUP BY 1, 2),
       |norms AS (SELECT doc_id, SUM(v * v) AS n2 FROM emb GROUP BY 1),
       |scored AS (
       |  SELECT qn.q_id, n.doc_id,
       |    ROUND(CAST(COALESCE(d.dot, 0) AS DOUBLE)
       |          / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(qn.qn2 AS DOUBLE))),
       |      6) AS score
       |  FROM norms n CROSS JOIN qn
       |  LEFT JOIN dots d ON d.q_id = qn.q_id AND d.doc_id = n.doc_id),
       |rk AS (SELECT q_id, doc_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY q_id
       |                            ORDER BY score DESC, doc_id) AS rn
       |       FROM scored)
       |SELECT q_id, doc_id, score FROM rk WHERE rn <= 5
       |ORDER BY q_id, score DESC, doc_id""".stripMargin
  }

  /** Q-embed-index-delete / -vacuum: the embed artifact's DELETE
    * lifecycle declared with full oracles (the bm25_delete/vacuum
    * symmetry) — the shared [[InvertedIndex.DeleteMod]] residue set
    * tombstones out (it contains a flagship winner, so the declared
    * top-5 visibly changes), masked reads and the post-vacuum folded
    * layout must both equal a from-scratch rebuild over the reduced
    * corpus. */
  private def deleteSet(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") % InvertedIndex.DeleteMod === InvertedIndex.DeleteRes &&
        col("doc_id") < InvertedIndex.DeleteMax)
      .select(col("doc_id"))

  def embedIndexDelete(spark: SparkSession, dir: String): DataFrame = {
    val layout = InvertedIndex.cloneIndexNamed(
      spark, dir, IndexName, "embed16", "embed-delete")
    InvertedIndex.deleteDocs(spark, layout, deleteSet(spark, dir))
    fetchJoin(embedOver(spark, layout), Tables.documents(spark, dir))
  }

  def embedIndexVacuum(spark: SparkSession, dir: String): DataFrame = {
    val layout = InvertedIndex.cloneIndexNamed(
      spark, dir, IndexName, "embed16", "embed-vacuum")
    InvertedIndex.deleteDocs(spark, layout, deleteSet(spark, dir))
    InvertedIndex.vacuum(spark, layout)
    fetchJoin(embedOver(spark, layout), Tables.documents(spark, dir))
  }

  // the reduced-corpus replay both delete-lifecycle states share (the
  // bm25DeleteSql template applied to the parameterized flagship oracle)
  val embedIndexDeleteSql: String = EmbedOps.embedKnnSql
    .replace("WITH norm AS",
      s"WITH d2 AS (SELECT doc_id, lang, text FROM documents " +
        s"WHERE NOT (doc_id % ${InvertedIndex.DeleteMod} = ${InvertedIndex.DeleteRes} " +
        s"AND doc_id < ${InvertedIndex.DeleteMax})),\nnorm AS")
    .replace("FROM documents)", "FROM d2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_index" -> (embedKnnIndexed _),
    "q_embed_index_upsert" -> (embedIndexUpsert _),
    "q_embed_index_query2" -> (embedKnnIndexedQuery2 _),
    "q_embed_index_batch" -> (embedIndexBatch _),
    "q_embed_index_delete" -> (embedIndexDelete _),
    "q_embed_index_vacuum" -> (embedIndexVacuum _))

  def oracles: Map[String, String] = Map(
    // shared VERBATIM with q_embed_knn_sql: the persisted artifact must
    // be invisible in every served value
    "q_embed_index" -> EmbedOps.embedKnnSql,
    "q_embed_index_upsert" -> embedIndexUpsertSql,
    "q_embed_index_query2" -> EmbedOps.embedKnnSqlFor(FlagshipQuery2),
    "q_embed_index_batch" -> embedBatchSql,
    // masked reads and the physical fold land on the identical
    // reduced-corpus rebuild — the same oracle for both states
    "q_embed_index_delete" -> embedIndexDeleteSql,
    "q_embed_index_vacuum" -> embedIndexDeleteSql)
}
