package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LSH MULTI-PROBE TUNING: the [[IvfTune]] recall/cost frontier applied
  * to the engine's OTHER bucketed ANN family — how wide a hamming-probe
  * ring does the random-hyperplane index need for a recall target, and
  * what does each ring cost in scan fraction?
  *
  * [[RandomHyperplaneLsh.searchMultiProbe]] hard-codes radius 1 (own
  * bucket + 8 hamming-1 neighbors) with a comment asserting the recall
  * cliff; this query MEASURES that assertion: for the same deterministic
  * query sample as q_nprobe_tune (the two families' frontiers are
  * comparable on the same queries by construction), every (query, vector)
  * pair carries the hamming distance between their bucket codes, and each
  * candidate radius r evaluates the search restricted to `hdist ≤ r` —
  * radius 8 spans all 256 buckets, the exact anchor. One scored corpus
  * pass; every per-radius evaluation is a filter + window over the SAME
  * materialized pair frame ([[IvfTune.sweepFrontier]], shared with the
  * IVF sweeps). Fully oracle-replayable: the plane signs are LCG
  * literals embedded in both engines' plans, and hamming distance is
  * `bit_count(xor(...))` in both.
  *
  * Scale shape: identical to q_nprobe_tune — the sweep costs ~one brute
  * batch-kNN over a bounded sample regardless of corpus size, and the
  * measured radius lands directly on the persisted layout
  * (q_ann_lsh_persisted's bucket directories: radius r reads
  * Σ_{i≤r} C(8,i) of 256 partitions as PartitionFilters).
  */
object LshTune {

  /** Candidate hamming radii; 8 flips every plane — all 256 buckets, the
    * exact anchor (recall 1.0 by construction). */
  val TuneRadii: Seq[Int] = Seq(0, 1, 2, 8)

  /** Q-lsh-tune: the radius frontier. Output: one row per candidate —
    * (radius, n_q, n_hits, recall_10, scan_frac, chosen). */
  def lshTune(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
      .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), dim))
    val qs = emb
      .filter(col("vec_id") >= 16 &&
        col("vec_id") % IvfTune.TuneSampleMod === IvfTune.TuneSampleRes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
        col("vec_norm").as("q_norm"), col("bucket").as("q_bucket"))
    val scored = emb
      .crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", KnnSearch.prenormedScore)
      .withColumn("hdist",
        bit_count(col("bucket").bitwiseXOR(col("q_bucket"))).cast("int"))
      .select(col("q_id"), col("vec_id"), col("score"), col("hdist"))
    IvfTune.sweepFrontier(scored, qs, TuneRadii, "hdist", "radius")
  }

  val lshTuneSql: String = {
    import VectorSql.{cosine => cos}
    val bkt = RandomHyperplaneLsh.bucketSqlPublic _
    val perRadius = TuneRadii.map { r =>
      s"""SELECT $r AS radius,
         |  (SELECT n_q FROM nq) AS n_q,
         |  (SELECT COUNT(*)
         |   FROM (SELECT q_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |                              ORDER BY score DESC, vec_id) AS r
         |         FROM scored WHERE hdist <= $r) p
         |   JOIN brute b ON b.q_id = p.q_id AND b.vec_id = p.vec_id
         |   WHERE p.r <= 10) AS n_hits,
         |  (SELECT COUNT(*) FROM scored WHERE hdist <= $r) AS n_cand""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH b AS (SELECT vec_id, embedding, ${bkt("embedding")} AS bucket
       |           FROM embeddings),
       |qs AS (SELECT vec_id AS q_id, embedding AS qe, ${bkt("embedding")} AS q_bucket
       |       FROM embeddings
       |       WHERE vec_id >= 16 AND vec_id % ${IvfTune.TuneSampleMod} = ${IvfTune.TuneSampleRes}),
       |scored AS MATERIALIZED (
       |  SELECT q.q_id, b.vec_id, ROUND(${cos("b.embedding", "q.qe")}, 6) AS score,
       |    CAST(bit_count(xor(b.bucket, q.q_bucket)) AS INTEGER) AS hdist
       |  FROM b CROSS JOIN qs q
       |  WHERE b.vec_id <> q.q_id),
       |brute AS MATERIALIZED (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id
       |                         ORDER BY score DESC, vec_id) AS r
       |    FROM scored) WHERE r <= 10),
       |nq AS (SELECT COUNT(*) AS n_q FROM qs),
       |tot AS (SELECT COUNT(*) AS n_pairs FROM scored),
       |sweep AS (
       |$perRadius
       |)
       |SELECT radius, n_q, n_hits,
       |  ROUND(CAST(n_hits AS DOUBLE) / CAST(n_q * 10 AS DOUBLE), 6) AS recall_10,
       |  ROUND(CAST(n_cand AS DOUBLE) / CAST((SELECT n_pairs FROM tot) AS DOUBLE), 6) AS scan_frac,
       |  radius = MIN(CASE WHEN ROUND(CAST(n_hits AS DOUBLE) / CAST(n_q * 10 AS DOUBLE), 6) >= ${IvfTune.TuneTarget}
       |               THEN radius END) OVER () AS chosen
       |FROM sweep ORDER BY radius""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lsh_tune" -> (lshTune _))

  def oracles: Map[String, String] = Map(
    "q_lsh_tune" -> lshTuneSql)
}
