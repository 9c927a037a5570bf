package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space corpus analytics: per-class centroids, outlier
  * detection against them, and hard-negative mining — the embedding-side
  * quality/curation counterpart of the text profiling suite (the
  * reference stores vectors but never analyzes them; these are the
  * diagnostics a training pipeline runs over its embedding table before
  * trusting labels or sampling contrastive pairs).
  *
  * All four declared queries are oracle-gated: the per-dimension means sum DECIMAL casts
  * (the q_anomaly discipline — exact, order-free, partial-aggregatable,
  * so the engine-dependent double-accumulation-order problem never
  * arises), and every downstream cosine runs from those identical
  * rounded inputs.
  */
object EmbedAnalytics {

  /** Per-(label, dimension) exact-decimal means — the shared core of this
    * suite.
    *
    * Scale shape: posexplode is map-side; the (label, dim) partial
    * aggregation combines before its exchange carries one row per
    * (label, dim) per task; downstream consumers group #labels×dim rows.
    * The DECIMAL(38,18) cast makes the per-dimension sum exact and thus
    * independent of partitioning — bit-identical to the oracle's
    * sequential sum by construction, not by accumulation-order luck. */
  private def perDimMeans(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        round(sum(col("x").cast("double").cast("decimal(38,18)")).cast("double") /
          count(lit(1)), 6).as("m"),
        count(lit(1)).as("n"))

  /** Q-label-centroids: the per-label mean embedding (and class size) —
    * the class prototype used for outlier screening, nearest-class-mean
    * classification, and cluster drift monitoring.
    *
    * DECLARED SHAPE: one row per (label, dimension) — all-scalar columns,
    * because the driver's pandas comparator cannot sort/hash an
    * array-typed cell (round-6 CORRECTNESS: `unhashable numpy.ndarray`).
    * The assembled array form lives in [[labelCentroids]] for the
    * in-plan consumers; the semantics (exact-decimal per-dimension
    * means) are identical — this is a presentation reshape only. */
  def labelCentroidsFlat(spark: SparkSession, dir: String): DataFrame =
    perDimMeans(spark, dir)
      .select(col("label"), col("pos").cast("long").as("pos"), col("m"),
        col("n").as("n_vectors"))
      .orderBy(col("label"), col("pos"))

  /** The centroid as an `array<double>` column, ordered by dimension —
    * the in-plan form [[embedOutliers]] and [[ncmEval]] consume (a
    * broadcast of #labels rows each carrying one dense vector). */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    perDimMeans(spark, dir).groupBy(col("label"))
      .agg(max(col("n")).as("n_vectors"),
        transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
      .orderBy(col("label"))

  /** The per-dimension exact-decimal mean CTEs, shared by every oracle in
    * this suite (the DedupOps.shinglesCte discipline: ONE definition of
    * the centroid arithmetic, so the oracles cannot drift apart). */
  private val centroidCte: String =
    """ex AS (
      |  SELECT label, UNNEST(list_transform(embedding, (x,i) -> {'i': i, 'x': x})) AS u
      |  FROM embeddings),
      |per AS (
      |  SELECT label, u.i - 1 AS pos,
      |    ROUND(CAST(SUM(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)
      |          / COUNT(*), 6) AS m,
      |    COUNT(*) AS n
      |  FROM ex GROUP BY 1, 2)""".stripMargin

  val labelCentroidsSql: String =
    s"""WITH $centroidCte
       |SELECT label, CAST(pos AS BIGINT) AS pos, m, CAST(n AS BIGINT) AS n_vectors
       |FROM per ORDER BY label, pos""".stripMargin

  /** Q-embed-outliers: the 20 vectors least similar to their OWN label's
    * centroid — mislabeled or out-of-distribution candidates (the
    * embedding-space analog of q_anomaly's z-score tail). The centroid
    * table is #labels rows and broadcasts; scoring is one map-side cosine
    * per vector over the scan. */
  def embedOutliers(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .join(broadcast(labelCentroids(spark, dir).select(col("label"), col("centroid"))),
        "label")
      .withColumn("centroid_cos", round(cosineSim(col("embedding"), col("centroid")), 6))
      .select(col("vec_id"), col("label"), col("centroid_cos"))
      .orderBy(col("centroid_cos").asc, col("vec_id"))
      .limit(20)

  val embedOutliersSql: String = {
    import graft.operators.{VectorSql => V}
    s"""WITH $centroidCte,
       |cent AS (SELECT label, list(m ORDER BY pos) AS centroid FROM per GROUP BY label)
       |SELECT e.vec_id, e.label,
       |  ROUND(${V.cosine("e.embedding", "c.centroid")}, 6) AS centroid_cos
       |FROM embeddings e JOIN cent c ON e.label = c.label
       |ORDER BY centroid_cos ASC, e.vec_id LIMIT 20""".stripMargin
  }

  /** Q-hard-negatives: for each of the first 5 query vectors, the 5 most
    * cosine-similar vectors with a DIFFERENT label — contrastive-training
    * hard-negative mining (the pairs a metric-learning run needs most).
    * Same shape as the batch kNN join (broadcast query block, one scored
    * pass, per-query rank pruned by WindowGroupLimit); the label
    * inequality is a map-side filter BEFORE ranking, so the window never
    * sees same-class rows. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("q_embedding"))
    // ONE shared per-query-top-K pipeline (KnnSearch.knnJoin) with the
    // label inequality as the candidate filter — not a copy of it
    KnnSearch.knnJoin(emb, q, 5,
        candidateFilter = col("label") =!= col("q_label"))
      .select(col("query_id").as("q_id"), col("vec_id"), col("label"),
        col("score"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val hardNegativesSql: String = {
    import graft.operators.{VectorSql => V}
    s"""WITH q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS qe
       |           FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.q_id, e.vec_id, e.label,
       |    ROUND(${V.cosine("e.embedding", "q.qe")}, 6) AS score
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> q.q_id AND e.label <> q.q_label),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |                               ORDER BY score DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id, label, score, rank FROM ranked
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** Q-ncm-eval: nearest-class-mean classification accuracy per label —
    * how separable the classes are in embedding space (the standard cheap
    * probe of embedding quality before training on the labels). Each
    * vector is assigned to its most-cosine-similar label centroid
    * (ROUNDED scores compared, ties → lowest label — both engines compare
    * identical values); accuracy is exact counts + one division.
    *
    * Scale shape: the centroid table broadcasts, argmax is the
    * [[IvfIndex.assign]] min-struct aggregation (partial-aggregated
    * map-side, no window), and the final per-label rollup is #labels
    * rows. */
  def ncmEval(spark: SparkSession, dir: String): DataFrame = {
    val cents = labelCentroids(spark, dir)
      .select(col("label").as("c_label"), col("centroid"))
    val pred = Tables.embeddings(spark, dir)
      .crossJoin(broadcast(cents))
      .withColumn("cos", round(cosineSim(col("embedding"), col("centroid")), 6))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(struct((-col("cos")).as("ns"), col("c_label"))).as("b"))
      .select(col("label"), col("b.c_label").as("pred"))
    pred.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy",
        round(col("n_correct").cast("double") / col("n").cast("double"), 6))
      .orderBy(col("label"))
  }

  val ncmEvalSql: String = {
    import graft.operators.{VectorSql => V}
    s"""WITH $centroidCte,
       |cent AS (SELECT label AS c_label, list(m ORDER BY pos) AS centroid
       |         FROM per GROUP BY label),
       |scored AS (
       |  SELECT e.vec_id, e.label, c.c_label,
       |    ROUND(${V.cosine("e.embedding", "c.centroid")}, 6) AS cos
       |  FROM embeddings e CROSS JOIN cent c),
       |pred AS (
       |  SELECT vec_id, label, c_label,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_label) AS rn
       |  FROM scored)
       |SELECT label, COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN c_label = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  ROUND(SUM(CASE WHEN c_label = label THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS accuracy
       |FROM pred WHERE rn = 1 GROUP BY label ORDER BY label""".stripMargin
  }

  /** DCG position discounts 1/ln(rank+1) as SHARED DOUBLE LITERALS: the
    * Scala doubles land verbatim in both the Spark expressions and the
    * oracle SQL (Double.toString round-trips), so neither engine's log()
    * implementation participates in the hash — the one FP hazard a
    * NDCG-across-engines comparison has. ln instead of log2 is fine: the
    * base cancels in the DCG/IDCG ratio. */
  private val LnDiscount: IndexedSeq[Double] =
    (1 to 10).map(k => math.log(k + 1.0))

  /** Q-retrieval-eval: RETRIEVAL QUALITY METRICS — recall@10, MRR@10 and
    * NDCG@10 per query, with same-label membership as the relevance
    * oracle (the standard label-as-relevance protocol for embedding
    * benchmarks when no judgment set exists). This is the evaluation
    * harness every retrieval/ANN deployment runs before trusting an
    * index: q_recall_eval audits an ANN layout against brute-force truth,
    * this audits the EMBEDDING SPACE itself against the labels.
    *
    * Rank metrics are FP-treacherous across engines; three disciplines
    * make them hash-stable: ranking compares ROUNDED scores (the knnJoin
    * contract), the DCG/IDCG sums are fixed-order pivot chains over the
    * 10 rank positions (the q_bm25 discipline — never an orderless SUM
    * of doubles), and the position discounts are shared double literals
    * ([[LnDiscount]]) rather than each engine's log().
    *
    * Scale shape: one broadcast of the M-query block over the corpus scan
    * (the knnJoin WindowGroupLimit pipeline), then the metric arithmetic
    * on M×10 rows — evaluation cost is one search batch, and the label
    * totals reuse the corpus's label histogram (#labels rows). */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val qLabels = Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"))
    val top = KnnSearch.knnJoin(emb, q, 10)
      .join(broadcast(qLabels), Seq("query_id"))
      .withColumn("rel", when(col("label") === col("q_label"), 1).otherwise(0))
    val positions = (1 to 10).map(k =>
      coalesce(max(when(col("rank") === k, col("rel"))), lit(0)).as(s"r$k"))
    val perQuery = top.groupBy(col("query_id"), col("q_label"))
      .agg(positions.head, positions.tail :+
        min(when(col("rel") === 1, col("rank"))).as("first_rel"): _*)
    val labelCounts = Tables.embeddings(spark, dir)
      .groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("n_label"))
    val withTotals = perQuery.join(broadcast(labelCounts), Seq("q_label"))
      .withColumn("n_rel", col("n_label") - 1)
      .withColumn("m", least(lit(10), col("n_rel")))
    val hits = (1 to 10).map(k => col(s"r$k")).reduce(_ + _)
    val dcg = (1 to 10).map(k =>
      col(s"r$k") / lit(LnDiscount(k - 1))).reduce(_ + _)
    val idcg = (1 to 10).map(k =>
      when(col("m") >= k, lit(1.0) / lit(LnDiscount(k - 1))).otherwise(lit(0.0)))
      .reduce(_ + _)
    withTotals
      .withColumn("hits", hits)
      .select(
        col("query_id").as("q_id"),
        col("n_rel"),
        col("hits").cast("long").as("hits"),
        when(col("m") <= 0, 0.0)
          .otherwise(round(col("hits").cast("double") / col("m"), 6)).as("recall_10"),
        when(col("first_rel").isNull, 0.0)
          .otherwise(round(lit(1.0) / col("first_rel"), 6)).as("mrr"),
        when(idcg <= 0.0, 0.0)
          .otherwise(round(dcg / idcg, 6)).as("ndcg_10"))
      .orderBy(col("q_id"))
  }

  val retrievalEvalSql: String = {
    import graft.operators.{VectorSql => V}
    val dcgChain = (1 to 10).map(k => s"r$k / ${LnDiscount(k - 1)}").mkString(" + ")
    val idcgChain = (1 to 10)
      .map(k => s"CASE WHEN m >= $k THEN 1.0 / ${LnDiscount(k - 1)} ELSE 0.0 END")
      .mkString(" + ")
    val hitsChain = (1 to 10).map(k => s"r$k").mkString(" + ")
    val pivots = (1 to 10)
      .map(k => s"COALESCE(MAX(CASE WHEN rank = $k THEN rel END), 0) AS r$k")
      .mkString(",\n       |    ")
    s"""WITH q AS (SELECT vec_id AS query_id, label AS q_label, embedding AS qe
       |           FROM embeddings WHERE vec_id < 20),
       |scored AS (
       |  SELECT q.query_id, q.q_label, e.label,
       |    ROUND(${V.cosine("e.embedding", "q.qe")}, 6) AS score, e.vec_id
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |                               ORDER BY score DESC, vec_id) AS rank
       |  FROM scored),
       |top AS (SELECT query_id, q_label,
       |               CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel, rank
       |        FROM ranked WHERE rank <= 10),
       |pq AS (
       |  SELECT query_id, q_label,
       |    $pivots,
       |    MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel
       |  FROM top GROUP BY query_id, q_label),
       |cnt AS (SELECT label AS q_label, COUNT(*) AS n_label FROM embeddings GROUP BY label),
       |tot AS (
       |  SELECT pq.*, cnt.n_label - 1 AS n_rel,
       |    LEAST(10, cnt.n_label - 1) AS m
       |  FROM pq JOIN cnt USING (q_label))
       |SELECT query_id AS q_id, n_rel,
       |  CAST($hitsChain AS BIGINT) AS hits,
       |  CASE WHEN m <= 0 THEN 0.0
       |       ELSE ROUND(CAST($hitsChain AS DOUBLE) / m, 6) END AS recall_10,
       |  CASE WHEN first_rel IS NULL THEN 0.0
       |       ELSE ROUND(1.0 / first_rel, 6) END AS mrr,
       |  CASE WHEN ($idcgChain) <= 0.0 THEN 0.0
       |       ELSE ROUND(($dcgChain) / ($idcgChain), 6) END AS ndcg_10
       |FROM tot ORDER BY q_id""".stripMargin
  }

  /** Neighborhood size of the margin criterion (Artetxe & Schwenk 2019's
    * k): each side's score is normalized by the mean of its k nearest
    * cross-set cosines. */
  val MarginK = 4

  /** Q-margin-mine: MARGIN-BASED PAIR MINING — the bitext-mining scoring
    * rule of Artetxe & Schwenk (2019) / CCMatrix, the standard tool for
    * harvesting aligned training pairs from two unaligned corpora: raw
    * cosine over-selects HUB vectors (points close to everything), so a
    * candidate pair (a, b) is scored by its cosine RELATIVE to what each
    * endpoint scores against its own neighborhood —
    * `margin = cos(a,b) / ((avg_k(a) + avg_k(b)) / 2)` with avg_k the
    * mean of the endpoint's top-[[MarginK]] cross-set cosines. A hub's
    * denominator is large, so its pairs rank down; an isolated mutual
    * match ranks up. The two "languages" here are the deterministic
    * odd/even vec_id split; mined output is each source's best target
    * with cosine and margin, global top-20 by margin.
    *
    * FP discipline: per-pair cosines are rounded once at scoring; each
    * avg is a FIXED-ORDER (r1+..+rk)/k over the rank-pivoted values (the
    * q_bm25 rule — never an orderless double SUM), so the margin divides
    * identical doubles in both engines.
    *
    * Scale shape (the [[KnnSearch.knnJoinLarge]] discipline — NOTHING
    * corpus-sized broadcasts, plan-asserted in EmbedAnalyticsSpec):
    * both parity halves are LSH-bucketed; the source side explodes to its
    * multi-probe set (own bucket + 8 hamming-1 neighbors — the probe
    * relation is SYMMETRIC under xor, so one scored pair set serves BOTH
    * directions of the margin criterion, halving the kernel work the two
    * knnJoin passes used to do); candidates merge-join ON THE BUCKET (one
    * shuffle per side, per-bucket-quadratic, never corpus-quadratic);
    * each direction ranks via WindowGroupLimit over the shared pair set;
    * rank pivots are id-keyed map-side partials; the neighborhood-stat
    * joins are key-partitioned shuffle joins (each side is one row per
    * query id — corpus-sized, so deliberately NOT hinted broadcast; AQE
    * may still elect a runtime broadcast at test scale, which is its
    * call to make from measured sizes); TakeOrderedAndProject for the
    * global top-20. Like any multi-probe LSH search this is approximate:
    * a query mines only candidates within hamming-1 of its bucket, and a
    * query without a FULL top-[[MarginK]] probed neighborhood abstains
    * (its avg would estimate hubness from a truncated sample — the same
    * reason the exact criterion fixes k) — the oracle replays the bucket
    * arithmetic bit-for-bit, so this is gated exact-on-the-probed-set. */
  def marginMine(spark: SparkSession, dir: String): DataFrame = {
    val b = KnnSearch.withNorm(Tables.embeddings(spark, dir))
      .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), 64))
    val src = b.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("src_id"), col("embedding").as("q_embedding"),
        col("vec_norm").as("q_norm"),
        explode(RandomHyperplaneLsh.probeBuckets(col("bucket"))).as("probe"))
    val tgt = b.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("tgt_id"), col("embedding"), col("vec_norm"),
        col("bucket"))
    val pairs = tgt.hint("merge")
      .join(src, col("bucket") === col("probe"))
      .withColumn("score", round(cosineSimPrenormed(
        dotProduct(col("embedding"), col("q_embedding")),
        col("vec_norm"), col("q_norm")), 6))
      .select(col("src_id"), col("tgt_id"), col("score"))
    import org.apache.spark.sql.expressions.Window
    val wFwd = Window.partitionBy(col("src_id"))
      .orderBy(col("score").desc, col("tgt_id"))
    val wBwd = Window.partitionBy(col("tgt_id"))
      .orderBy(col("score").desc, col("src_id"))
    val fwd = pairs.withColumn("rank", row_number().over(wFwd))
      .filter(col("rank") <= MarginK)
    val bwd = pairs.withColumn("rank", row_number().over(wBwd))
      .filter(col("rank") <= MarginK)
    // null-sum propagation encodes the abstention rule: any missing rank
    // 1..k nulls the pivot chain, and the filter drops the query —
    // exactly the oracle's HAVING COUNT(*) = k (ranks are consecutive).
    def avgK(ranked: DataFrame, idName: String, avgName: String): DataFrame =
      ranked.groupBy(col(idName))
        .pivot("rank", 1 to MarginK)
        .agg(first(col("score")))
        .select(col(idName),
          ((1 to MarginK).map(r => col(r.toString)).reduce(_ + _) /
            lit(MarginK.toDouble)).as(avgName))
        .filter(col(avgName).isNotNull)
    val avgSrc = avgK(fwd, "src_id", "avg_src")
    val avgTgt = avgK(bwd, "tgt_id", "avg_tgt")
    fwd.filter(col("rank") === 1)
      .select(col("src_id"), col("tgt_id"), col("score").as("cos"))
      .join(avgSrc, Seq("src_id"))
      .join(avgTgt, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("cos"),
        round(col("cos") / ((col("avg_src") + col("avg_tgt")) / 2.0), 6).as("margin"))
      .orderBy(col("margin").desc, col("src_id"))
      .limit(20)
  }

  val marginMineSql: String = {
    import graft.operators.{VectorSql => V}
    val c = V.cosine("s.embedding", "t.embedding")
    val avgChain =
      "(" + (1 to MarginK).map(r => s"SUM(c) FILTER (WHERE rk = $r)")
        .mkString(" + ") + s") / ${MarginK}.0"
    val probeList = ("bucket" +:
      (0 until RandomHyperplaneLsh.Planes)
        .map(p => s"xor(bucket, ${1L << p})")).mkString("[", ", ", "]")
    s"""WITH b AS (SELECT vec_id, embedding,
       |             ${RandomHyperplaneLsh.bucketSqlPublic("embedding")} AS bucket
       |           FROM embeddings),
       |s AS (SELECT vec_id, embedding, unnest($probeList) AS probe
       |      FROM b WHERE vec_id % 2 = 1),
       |x AS (
       |  SELECT s.vec_id AS sid, t.vec_id AS tid, ROUND($c, 6) AS c
       |  FROM s JOIN b t ON t.bucket = s.probe AND t.vec_id % 2 = 0),
       |fr AS (SELECT sid, tid, c,
       |         ROW_NUMBER() OVER (PARTITION BY sid ORDER BY c DESC, tid) AS rk
       |       FROM x),
       |br AS (SELECT tid, c,
       |         ROW_NUMBER() OVER (PARTITION BY tid ORDER BY c DESC, sid) AS rk
       |       FROM x),
       |fa AS (SELECT sid, $avgChain AS avg_src
       |       FROM fr WHERE rk <= $MarginK GROUP BY sid
       |       HAVING COUNT(*) = $MarginK),
       |ba AS (SELECT tid, $avgChain AS avg_tgt
       |       FROM br WHERE rk <= $MarginK GROUP BY tid
       |       HAVING COUNT(*) = $MarginK),
       |best AS (SELECT sid, tid, c FROM fr WHERE rk = 1)
       |SELECT b.sid AS src_id, b.tid AS tgt_id, b.c AS cos,
       |  ROUND(b.c / ((fa.avg_src + ba.avg_tgt) / 2.0), 6) AS margin
       |FROM best b JOIN fa ON fa.sid = b.sid JOIN ba ON ba.tid = b.tid
       |ORDER BY margin DESC, src_id LIMIT 20""".stripMargin
  }

  /** Truncation prefixes evaluated by q_mrl_eval; the last is the full
    * dimension (recall 1.0 by construction — the sanity anchor). */
  val MrlDims = Seq(8, 16, 32, 64)

  /** Q-mrl-eval: MATRYOSHKA truncation evaluation — how much retrieval
    * quality survives truncating embeddings to their leading dimensions
    * (Kusupati et al. 2022's deployment question: MRL-trained models let
    * you serve a d/8 prefix at 8× less bandwidth/memory — but you only
    * get to do that after MEASURING the recall cliff on your corpus).
    * For each prefix length d: exact top-10 by cosine over the FIRST d
    * components, recall@10 against the full-dimension top-10. One row
    * per d, exact and fully oracle-replayable (list slicing exists in
    * both engines).
    *
    * Scale shape: one scored scan + TakeOrderedAndProject per prefix
    * (the q_knn shape with a sliced kernel); the per-dim semi-join
    * compares 10-row frames. At 100 TB the interesting composition is
    * the quantization ladder's: a short-prefix pass over 1/8 of the
    * bytes as the shortlist stage, full-dim rerank on the survivors —
    * this query is the measurement that justifies (or vetoes) it. */
  def mrlEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = broadcast(emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe")))
    def top10(d: Int): DataFrame =
      emb.crossJoin(q).filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(cosineSim(slice(col("embedding"), 1, d),
            slice(col("qe"), 1, d)), 6).as("s"))
        .orderBy(col("s").desc, col("vec_id")).limit(10)
        .select(col("vec_id"))
    val full = top10(MrlDims.last).localCheckpoint(eager = true) // 10 ids, reused per dim
    MrlDims.map { d =>
      // the full-dim row is 10/10 against itself by construction — reuse
      // the materialized frame instead of re-scoring the corpus
      val topD = if (d == MrlDims.last) full else top10(d)
      topD.join(full, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(d).as("dim"), col("n_hits"))
    }.reduce(_ unionByName _)
      .select(col("dim"), col("n_hits"),
        round(col("n_hits").cast("double") / 10.0, 6).as("recall_10"))
      .orderBy(col("dim"))
  }

  val mrlEvalSql: String = {
    import graft.operators.{VectorSql => V}
    def topCte(d: Int) =
      s"""d$d AS (SELECT e.vec_id FROM embeddings e, q
         |        WHERE e.vec_id <> 0
         |        ORDER BY ROUND(${V.cosine(s"e.embedding[1:$d]", s"q.qe[1:$d]")}, 6) DESC,
         |          e.vec_id
         |        LIMIT 10)""".stripMargin
    val full = MrlDims.last
    val rows = MrlDims.map { d =>
      s"""SELECT $d AS dim,
         |  CAST((SELECT COUNT(*) FROM d$d
         |        WHERE vec_id IN (SELECT vec_id FROM d$full)) AS BIGINT) AS n_hits""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |${MrlDims.map(topCte).mkString(",\n")}
       |SELECT dim, n_hits, ROUND(n_hits / 10.0, 6) AS recall_10 FROM (
       |$rows
       |) ORDER BY dim""".stripMargin
  }

  /** Serving prefix length and shortlist size for [[mrlKnn]] — the values
    * the q_mrl_eval measurement justifies on THIS corpus: d=8/16 recalls
    * sit under the cliff (the embeddings are not matryoshka-trained, as
    * the measurement is designed to reveal), d=32 with a 200-candidate
    * shortlist recovers 0.9–1.0 recall@10 at every SF (spec-gated). An
    * MRL-trained model would justify a shorter prefix and a smaller
    * shortlist — that is exactly the dial q_mrl_eval exists to set. */
  val MrlServeDim = 32
  val MrlShortlist = 200

  /** Q-mrl-knn: MATRYOSHKA PREFIX SERVING — the deployment q_mrl_eval's
    * measurement justifies (the engine's measurement→deployment pattern:
    * q_embed_covariance → q_embed_pca → q_pca_recall): a COARSE pass
    * ranks by cosine over the leading [[MrlServeDim]] components only,
    * keeps a [[MrlShortlist]]-candidate shortlist, and an exact full-
    * dimension rerank of the shortlist serves the top-10 (each row
    * carries both the coarse and exact scores — the served ranking is
    * the exact one).
    *
    * Scale shape: the coarse pass is one scored scan +
    * TakeOrderedAndProject (the q_knn shape with a sliced kernel, half
    * the multiply-adds at d=32); the rerank touches S rows. At 100 TB a
    * production MRL layout splits the stored array into prefix/suffix
    * COLUMNS so the coarse scan's ReadSchema prunes to d/64 of the
    * bytes (parquet cannot prune inside one array cell) — the serving
    * composition (coarse shortlist → exact rerank) is identical.
    * Fully oracle-replayable: both engines slice lists natively. */
  def mrlKnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = broadcast(emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe")))
    val shortlist = emb.crossJoin(q).filter(col("vec_id") =!= 0)
      .withColumn("pcos", round(cosineSim(
        slice(col("embedding"), 1, MrlServeDim),
        slice(col("qe"), 1, MrlServeDim)), 6))
      .orderBy(col("pcos").desc, col("vec_id")).limit(MrlShortlist)
    shortlist
      .withColumn("score", round(cosineSim(col("embedding"), col("qe")), 6))
      .orderBy(col("score").desc, col("vec_id")).limit(10)
      .select(col("vec_id"), col("label"), col("pcos"), col("score"))
  }

  val mrlKnnSql: String = {
    import graft.operators.{VectorSql => V}
    val d = MrlServeDim
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |shortlist AS (
       |  SELECT e.vec_id, e.label, e.embedding, q.qe,
       |    ROUND(${V.cosine(s"e.embedding[1:$d]", s"q.qe[1:$d]")}, 6) AS pcos
       |  FROM embeddings e, q WHERE e.vec_id <> 0
       |  ORDER BY pcos DESC, e.vec_id LIMIT $MrlShortlist)
       |SELECT vec_id, label, pcos,
       |  ROUND(${V.cosine("embedding", "qe")}, 6) AS score
       |FROM shortlist ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_label_centroids" -> (labelCentroidsFlat _),
    "q_embed_outliers" -> (embedOutliers _),
    "q_hard_negatives" -> (hardNegatives _),
    "q_retrieval_eval" -> (retrievalEval _),
    "q_margin_mine" -> (marginMine _),
    "q_mrl_eval" -> (mrlEval _),
    "q_mrl_knn" -> (mrlKnn _),
    "q_ncm_eval" -> (ncmEval _))

  def oracles: Map[String, String] = Map(
    "q_label_centroids" -> labelCentroidsSql,
    "q_embed_outliers" -> embedOutliersSql,
    "q_hard_negatives" -> hardNegativesSql,
    "q_retrieval_eval" -> retrievalEvalSql,
    "q_margin_mine" -> marginMineSql,
    "q_mrl_eval" -> mrlEvalSql,
    "q_mrl_knn" -> mrlKnnSql,
    "q_ncm_eval" -> ncmEvalSql)
}
