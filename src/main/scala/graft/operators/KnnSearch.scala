package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding table — the reference's core
  * capability (Pinecone top-K cosine query, reference `main.go:89-139`),
  * re-expressed as Spark plans.
  *
  * Scale design (100 TB / 1000 executors):
  *  - the index side stays partitioned and is NEVER shuffled for a search:
  *    queries are broadcast, scores are computed map-side, and top-K is
  *    TakeOrderedAndProject (per-partition heaps + driver merge of K×P rows,
  *    no global sort);
  *  - batch kNN (M queries × N vectors) broadcasts the query block and uses
  *    per-query ranking windows; Spark 3.5+ plans the rank filter as
  *    WindowGroupLimit, keeping K rows per (partition, query) before the
  *    single shuffle on query_id;
  *  - `withNorm` materializes ‖v‖ once per indexed vector so each scored
  *    pair costs one array pass (dot product), not three — at dim 1536 this
  *    is a 3× scan-cost cut on the hot path;
  *  - for sub-linear search, [[IvfIndex]] prunes to a few centroid buckets.
  */
object KnnSearch {

  /** Index build: precompute the L2 norm per vector (stored alongside, the
    * way a real index materializes auxiliary per-row state). */
  def withNorm(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb.withColumn("vec_norm", l2Norm(col(vecCol)))

  /** The three index metrics of the reference's descriptor
    * (`upsert/upsert.go:27`, `main.go:28`). */
  val Metrics: Set[String] = Set("cosine", "euclidean", "dotproduct")

  /** THE scoring kernel, shared by every search variant (brute-force, IVF,
    * LSH, text search): cosine via stored norms — one array pass (dot) per
    * scored pair — rounded to the engine-portable 6 places. Arithmetic is
    * identical to [[VectorFunctions.cosineSim]] (norms just computed once),
    * so oracle parity holds everywhere it is used. Expects columns
    * (embedding, vec_norm) on the index side and (q_embedding, q_norm) on
    * the query side. */
  private[graft] def prenormedScore: Column =
    round(cosineSimPrenormed(
      dotProduct(col("embedding"), col("q_embedding")),
      col("vec_norm"), col("q_norm")), 6)

  /** Per-pair score for a configured metric — all are one native-codegen
    * array pass per pair. Cosine uses the stored norms; euclidean and
    * dotproduct don't need them. */
  private[graft] def metricScore(metric: String): Column = metric match {
    case "cosine" => prenormedScore
    case "dotproduct" => round(dotProduct(col("embedding"), col("q_embedding")), 6)
    case "euclidean" => round(l2Dist(col("embedding"), col("q_embedding")), 6)
    case other => throw new IllegalArgumentException(
      s"unknown metric '$other' (expected one of ${Metrics.mkString(", ")})")
  }

  /** Best-first ordering per metric: similarity metrics rank descending,
    * euclidean DISTANCE ascending. */
  private[graft] def scoreOrder(metric: String): Column =
    if (metric == "euclidean") col("score").asc else col("score").desc

  /** Deterministic top-K on an already-scored frame: best score first, id
    * asc tiebreak (SURVEY.md §7.3) — plans as TakeOrderedAndProject. */
  private[graft] def rankTopK(scored: DataFrame, idCol: String, k: Int,
                              metric: String = "cosine"): DataFrame =
    scored.orderBy(scoreOrder(metric), col(idCol)).limit(k)

  /** Score every index row against one broadcast query row and keep top-K
    * under the index's declared metric. `query` must be a 1-row DataFrame
    * with columns (q_id, q_embedding); `index` must carry `vec_norm` (see
    * [[withNorm]]). `keep` passes extra index columns (e.g. the ANN
    * partition bucket) through to the result. */
  def topK(index: DataFrame, query: DataFrame, k: Int,
           metric: String = "cosine", keep: Seq[String] = Nil): DataFrame =
    rankTopK(
      index
        .crossJoin(broadcast(query.withColumn("q_norm", l2Norm(col("q_embedding")))))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("score", metricScore(metric))
        .select(col("vec_id") +: col("label") +: keep.map(col) :+ col("score"): _*),
      "vec_id", k, metric)

  /** Batch kNN join: top-K neighbors for EVERY query row (the north-star
    * "similarity search as a join", SURVEY.md §2.3 J2). `candidateFilter`
    * restricts candidates BEFORE ranking (e.g. a label inequality for
    * hard-negative mining) so excluded rows never occupy a rank slot —
    * there is exactly one copy of this broadcast + score + WindowGroupLimit
    * pipeline, shared by every per-query-top-K variant. */
  def knnJoin(index: DataFrame, queries: DataFrame, k: Int,
              metric: String = "cosine",
              candidateFilter: Column = lit(true)): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(scoreOrder(metric), col("vec_id"))
    index
      .crossJoin(broadcast(queries.withColumn("q_norm", l2Norm(col("q_embedding")))))
      .filter(col("vec_id") =!= col("query_id") && candidateFilter)
      .withColumn("score", metricScore(metric))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("label"), col("score"), col("rank"))
  }

  /** Batch kNN join for query blocks TOO LARGE TO BROADCAST — the
    * corpus-vs-corpus case (M ≈ N, e.g. all-pairs similarity over the
    * whole embedding table), where [[knnJoin]]'s broadcast of the query
    * side would not fit an executor.
    *
    * Shape: both sides are bucketed with [[RandomHyperplaneLsh.bucket]]
    * and equi-joined ON THE BUCKET — a shuffle join (hinted merge so the
    * optimizer never "helpfully" broadcasts at test scale; at 100 TB
    * neither side is broadcastable and the hint is what the planner would
    * choose anyway). Each side shuffles once on the bucket key; candidate
    * pairs are per-bucket quadratic — bounded by the bucket fanout, never
    * corpus-quadratic — and ranking keeps top-K per query via
    * WindowGroupLimit. Like any single-probe LSH search this is
    * approximate: a query only sees neighbors in its own bucket (recall
    * tunable via multi-probe exactly as in [[RandomHyperplaneLsh
    * .searchMultiProbe]]). Queries alone in their bucket emit nothing. */
  def knnJoinLarge(index: DataFrame, dim: Int, k: Int): DataFrame = {
    val bucketed = withNorm(index)
      .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), dim))
    val qs = bucketed.select(
      col("vec_id").as("query_id"), col("embedding").as("q_embedding"),
      col("vec_norm").as("q_norm"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    bucketed
      .hint("merge")
      .join(qs, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", prenormedScore)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("label"), col("score"), col("rank"))
  }

  /** Point lookup by ID — the reference's `vectors/fetch?ids=` path
    * (`main.go:143`), here a predicate pushed into the Parquet scan. */
  def fetch(emb: DataFrame, vecId: Long): DataFrame =
    emb.filter(col("vec_id") === vecId)
}

/** Portable DuckDB SQL fragments for the same arithmetic (oracle side).
  * DuckDB's native `list_cosine_similarity` accumulates in float32 (≈1e-7
  * error vs double — measured), so the oracle spells out the double-width
  * arithmetic that the Spark expressions use. */
object VectorSql {
  /** Σ aᵢ·bᵢ in double, 1-based index lambda. */
  def dot(a: String, b: String): String =
    s"list_sum(list_transform($a, (x,i) -> CAST(x AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def norm(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** Guarded like the Spark side's cosineSimPrenormed: cosine against a
    * zero-norm vector is defined as 0, not 0/0 — without the CASE the
    * oracle would emit NaN/NULL for a zero vector while the engine emits
    * 0.0, a latent hash divergence the testdata happens not to exercise. */
  def cosine(a: String, b: String): String =
    s"(CASE WHEN ${norm(a)} * ${norm(b)} = 0.0 THEN 0.0 " +
      s"ELSE ${dot(a, b)} / (${norm(a)} * ${norm(b)}) END)"

  /** √(Σ (aᵢ−bᵢ)²) in double — same sequential accumulation as
    * [[graft.functions.L2Distance]]. */
  def l2dist(a: String, b: String): String =
    s"sqrt(list_sum(list_transform($a, (x,i) -> " +
      s"(CAST(x AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST($b[i] AS DOUBLE)))))"
}
