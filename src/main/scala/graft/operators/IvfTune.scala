package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF PARAMETER AUTO-TUNING: pick the serving `nprobe` from a measured
  * recall target instead of folklore — the measurement→deployment pattern
  * (q_embed_covariance → q_embed_pca → q_pca_recall, q_mrl_eval →
  * q_mrl_knn) applied to the one dial every IVF deployment must set. The
  * reference delegates this wholesale to Pinecone (`upsert/upsert.go:27`
  * declares the index, the service picks its own probe policy); published
  * IVF systems expose nprobe and tell the user to sweep it — this operator
  * IS that sweep, as a declared query.
  *
  * For a deterministic sample of query vectors, replay the probed search
  * at every candidate nprobe and measure mean recall@10 against the exact
  * brute-force top-10. One row per candidate; `chosen` marks the smallest
  * nprobe whose mean recall clears [[TuneTarget]] — the value a
  * recall-targeted deployment would dial into the q_knn_auto serving
  * path. On THIS corpus the sweep is deliberately revealing: the
  * deterministic seed centroids (lowest-16 vectors, no k-means) measure
  * ~0.5 mean recall at the serving default nprobe=4 and the tune chooses
  * the full depth — the quantified case for [[IvfIndex.trainCentroids]]'
  * Lloyd iterations before trusting a shallow probe, which is precisely
  * the adjudication this operator exists to automate (a per-query probed
  * oracle can never see DISTRIBUTIONAL recall; the sweep does).
  *
  * Scale shape (100 TB): the corpus is scanned ONCE — queries × corpus
  * scores plus each vector's centroid assignment land in one pair frame
  * (Q·N rows of (q_id, vec_id, score, prank) — ids and doubles, no
  * embeddings), and every per-nprobe evaluation is a filter + window over
  * that SAME materialized frame (prank ≤ n selects the pairs a probed
  * search at n would score; no re-scan, no re-scoring). The probe-depth
  * join is against a Q×k centroid ranking — broadcast-sized. Sampling is
  * the scale dial: Q grows with a fixed modulus here to exercise the
  * set-wise shape, a production tune pins Q (a few hundred queries bound
  * the whole sweep regardless of corpus size). All arithmetic is the
  * shared kernel + integer hit counting — fully oracle-replayable.
  */
object IvfTune {

  /** Candidate probe depths; the last is every bucket — recall 1.0 by
    * construction, the sanity anchor (the [[EmbedAnalytics.MrlDims]]
    * discipline). */
  val TuneNprobes: Seq[Int] = Seq(1, 2, 4, 8, 16)

  /** Mean-recall@10 target the chosen nprobe must clear. */
  val TuneTarget = 0.9

  /** The depth q_nprobe_tune CHOOSES on this corpus, pinned as the
    * serving constant the tuned-serving query dials in (q_knn_auto_tuned
    * — the q_fusion_tune → q_fusion_serve measurement→deployment
    * precedent). IvfTuneSpec gates this constant against the LIVE sweep,
    * so a corpus or ladder change that moves the choice fails the pin
    * instead of silently serving a stale dial. On the deterministic seed
    * centroids the honest choice is the FULL fanout (the sweep measures
    * ~0.4–0.5 mean recall at the latency-default nprobe=4) — exactly the
    * verdict the measurement exists to surface; a trained coarse
    * quantizer moves the frontier (q_nprobe_tune_trained). */
  val TunedNprobe = 16

  /** The chosen row of the live sweep — the spec-pin's measured side. */
  private[operators] def chosenNprobe(spark: SparkSession, dir: String): Int =
    nprobeTune(spark, dir).filter(col("chosen"))
      .select(col("nprobe")).head().getInt(0)

  /** Deterministic query sample: vec_id ≡ 5 (mod 37), excluding the 16
    * seed-centroid vectors (each sits in its own bucket — sampling them
    * would flatter recall at nprobe=1). */
  val TuneSampleMod = 37
  val TuneSampleRes = 5

  /** Q-nprobe-tune: the recall/COST frontier over the deterministic seed
    * centroids. Output: one row per candidate nprobe — (nprobe, n_q,
    * n_hits, recall_10, scan_frac, chosen) where scan_frac is the
    * fraction of candidate pairs a probed search at that depth actually
    * scores (the scan the PartitionFilters admit) — the frontier a
    * deployment trades on: recall_10 is what depth buys, scan_frac is
    * what it costs. */
  def nprobeTune(spark: SparkSession, dir: String): DataFrame =
    nprobeTuneOver(spark, dir, VectorOps.seedCentroids(spark, dir))

  /** Q-nprobe-tune-trained: the SAME sweep over Lloyd-trained centroids
    * ([[IvfIndex.trainCentroids]], the [[graft.sources.Maintenance]]
    * rebuild path's training) — the re-measurement that closes the
    * index-quality loop: q_ivf_drift detects imbalance,
    * rebuildIvfTrained retrains, and THIS query quantifies what the
    * retraining bought. On this corpus the honest answer is "modest but
    * uniform": 3 Lloyd iterations lift mean recall@10 at EVERY depth in
    * {2,4,8} at every SF (0.385→0.500 at sf0.01 nprobe=4; +4–35%
    * elsewhere), while depth 1 at the smallest SF can trade away
    * (different Voronoi boundaries move different queries' true
    * neighbors out of the single probed bucket) — exactly why a
    * deployment reads the sweep instead of assuming retraining helps
    * everywhere. IvfTuneSpec gates the measured {2,4,8} dominance at
    * all three SFs. Declared rows-only: k-means
    * means are float accumulations whose reduction order is not
    * cross-engine replayable (the PqIndex precedent); the sweep
    * arithmetic itself is the oracle-proven q_nprobe_tune pipeline. */
  def nprobeTuneTrained(spark: SparkSession, dir: String): DataFrame =
    nprobeTuneOver(spark, dir, trainedCentroids(spark, dir))

  /** Lloyd-trained centroid table for [[nprobeTuneTrained]]: k=16 to
    * match the seed layout, 3 iterations from the seed starting points
    * (centroid ids stay the seeds'; empty clusters drop, standard
    * Lloyd — the sweep ranks whatever centroids survive). */
  private[operators] def trainedCentroids(spark: SparkSession,
                                          dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    IvfIndex.trainCentroids(emb, k = 16, dim = 64, iterations = 3)
  }

  /** The sweep body, parameterized by the centroid table (columns
    * cent_id, c_embedding, c_norm) so the seed and trained variants are
    * ONE arithmetic. */
  private def nprobeTuneOver(spark: SparkSession, dir: String,
                             cent: DataFrame): DataFrame = {
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val qs = emb
      .filter(col("vec_id") >= 16 &&
        col("vec_id") % TuneSampleMod === TuneSampleRes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
        col("vec_norm").as("q_norm"))
    // per-query centroid ranking: the probe ORDER every nprobe shares —
    // a probed search at depth n reads exactly the buckets with prank ≤ n
    val pw = Window.partitionBy(col("q_id"))
      .orderBy(col("p_score").desc, col("cent_id"))
    val prank = qs.crossJoin(broadcast(cent))
      .withColumn("p_score", cosineSimPrenormed(
        dotProduct(col("c_embedding"), col("q_embedding")),
        col("c_norm"), col("q_norm")))
      .select(col("q_id"), col("cent_id"), row_number().over(pw).as("prank"))
    // one scored pass: queries × corpus, each pair carrying the probe
    // depth at which its bucket enters the search. Materialized once and
    // reused by the brute truth + every per-nprobe evaluation (ids and
    // doubles only — no embeddings ride the checkpoint).
    val scored = IvfIndex.assign(emb, cent)
      .crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", KnnSearch.prenormedScore)
      .join(broadcast(prank), Seq("q_id", "cent_id"))
      .select(col("q_id"), col("vec_id"), col("score"), col("prank"))
    sweepFrontier(scored, qs, TuneNprobes, "prank", "nprobe")
  }

  /** The frontier evaluation every tuning family shares (IVF probe depth,
    * LSH hamming radius — ONE implementation, so the families' frontiers
    * are comparable by construction): materialize the scored pair frame
    * once (ids and doubles only), rank the brute truth, then per ladder
    * step filter `depthCol ≤ step`, re-rank, semi-join against truth, and
    * report (n_hits, recall_10, n_cand, scan_frac, chosen). */
  private[operators] def sweepFrontier(pairs: DataFrame, qs: DataFrame,
                                       ladder: Seq[Int], depthCol: String,
                                       outCol: String): DataFrame = {
    val scored = pairs.localCheckpoint(eager = true)
    val rw = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val brute = scored
      .withColumn("r", row_number().over(rw)).filter(col("r") <= 10)
      .select(col("q_id"), col("vec_id"))
      .localCheckpoint(eager = true) // 10·Q ids, reused per candidate
    val nq = qs.agg(count(lit(1)).as("n_q"))
    val tot = scored.agg(count(lit(1)).as("n_pairs"))
    val sweep = ladder.map { n =>
      // the COST side of the frontier: how much of the corpus a probed
      // search at this depth actually scores (the scan the PartitionFilters
      // admit), measured on the same pair frame the recall side ranks
      val cand = scored.filter(col(depthCol) <= n)
        .agg(count(lit(1)).as("n_cand"))
      scored.filter(col(depthCol) <= n)
        .withColumn("r", row_number().over(rw)).filter(col("r") <= 10)
        .join(brute, Seq("q_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(nq).crossJoin(cand).crossJoin(tot)
        .select(lit(n).as(outCol), col("n_q"), col("n_hits"),
          round(col("n_hits").cast("double") /
            (col("n_q") * 10).cast("double"), 6).as("recall_10"),
          round(col("n_cand").cast("double") /
            col("n_pairs").cast("double"), 6).as("scan_frac"))
    }.reduce(_ unionByName _)
    // chosen = the smallest candidate clearing the target (ladder-row window)
    sweep
      .withColumn("chosen",
        col(outCol) === min(when(col("recall_10") >= TuneTarget,
          col(outCol))).over(Window.partitionBy()))
      .orderBy(col(outCol))
  }

  val nprobeTuneSql: String = {
    import VectorSql.{cosine => cos}
    val perProbe = TuneNprobes.map { n =>
      s"""SELECT $n AS nprobe,
         |  (SELECT n_q FROM nq) AS n_q,
         |  (SELECT COUNT(*)
         |   FROM (SELECT q_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |                              ORDER BY score DESC, vec_id) AS r
         |         FROM scored WHERE prank <= $n) p
         |   JOIN brute b ON b.q_id = p.q_id AND b.vec_id = p.vec_id
         |   WHERE p.r <= 10) AS n_hits,
         |  (SELECT COUNT(*) FROM scored WHERE prank <= $n) AS n_cand""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < 16),
       |qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
       |       WHERE vec_id >= 16 AND vec_id % $TuneSampleMod = $TuneSampleRes),
       |asg AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |                       ORDER BY ${cos("e.embedding", "c.ce")} DESC, c.cent_id) AS rn
       |  FROM embeddings e, cent c),
       |a1 AS (SELECT vec_id, embedding, cent_id FROM asg WHERE rn = 1),
       |prank AS (
       |  SELECT q.q_id, c.cent_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.q_id
       |                       ORDER BY ${cos("c.ce", "q.qe")} DESC, c.cent_id) AS prank
       |  FROM qs q, cent c),
       |scored AS MATERIALIZED (
       |  SELECT q.q_id, a.vec_id, ROUND(${cos("a.embedding", "q.qe")}, 6) AS score, p.prank
       |  FROM a1 a CROSS JOIN qs q
       |  JOIN prank p ON p.q_id = q.q_id AND p.cent_id = a.cent_id
       |  WHERE a.vec_id <> q.q_id),
       |brute AS MATERIALIZED (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id
       |                         ORDER BY score DESC, vec_id) AS r
       |    FROM scored) WHERE r <= 10),
       |nq AS (SELECT COUNT(*) AS n_q FROM qs),
       |tot AS (SELECT COUNT(*) AS n_pairs FROM scored),
       |sweep AS (
       |$perProbe
       |)
       |SELECT nprobe, n_q, n_hits,
       |  ROUND(CAST(n_hits AS DOUBLE) / CAST(n_q * 10 AS DOUBLE), 6) AS recall_10,
       |  ROUND(CAST(n_cand AS DOUBLE) / CAST((SELECT n_pairs FROM tot) AS DOUBLE), 6) AS scan_frac,
       |  nprobe = MIN(CASE WHEN ROUND(CAST(n_hits AS DOUBLE) / CAST(n_q * 10 AS DOUBLE), 6) >= $TuneTarget
       |               THEN nprobe END) OVER () AS chosen
       |FROM sweep ORDER BY nprobe""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_nprobe_tune" -> (nprobeTune _),
    "q_nprobe_tune_trained" -> (nprobeTuneTrained _))

  // q_nprobe_tune_trained is rows-only by design (Lloyd means are not
  // cross-engine replayable); IvfTuneSpec gates the measured dominance.
  def oracles: Map[String, String] = Map(
    "q_nprobe_tune" -> nprobeTuneSql)
}
