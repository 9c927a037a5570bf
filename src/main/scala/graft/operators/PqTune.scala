package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PQ COMPRESSION TUNING — the quantization member of the tuning family
  * (q_nprobe_tune: IVF probe depth; q_lsh_tune: hamming probe radius;
  * q_band_tune: MinHash banding; this: the PQ subquantizer count), so
  * every approximate family the engine ships carries its measured
  * recall/cost frontier instead of a hard-coded dial. The reference
  * delegates quantization wholesale to Pinecone (`upsert/upsert.go:27`);
  * FAISS exposes `m` and tells the user to sweep it — this operator IS
  * that sweep, as a declared query over the SAME deterministic query
  * sample as the other ANN tunes (vec_id ≡ 5 mod 37, ≥ 16 — the
  * frontiers are comparable by construction).
  *
  * Per candidate m ∈ [[PqTune.Ms]] (subDim = 64/m, K=16 per subspace):
  * train codebooks on the bounded sample, encode the corpus (map-side),
  * ADC-score the query block against every code, shortlist
  * [[PqIndex.Shortlist]], exact-rerank, and report mean recall@10
  * against the brute truth — plus the COST column the frontier trades
  * on: `code_bytes` = m (the stored bytes per vector) and `compression`
  * = 256/m vs the raw float vector. `chosen` = the CHEAPEST (fewest
  * bytes) m clearing [[IvfTune.TuneTarget]] — the uniform chosen-flag
  * contract across the family.
  *
  * Scale shape (100 TB): ONE exact pass (queries × corpus — Q is the
  * sampling dial, fixed at a few hundred at scale) is materialized as an
  * id/score pair frame and reused as BOTH the brute truth and every
  * candidate's rerank source (no re-scoring); per candidate, training
  * reads the [[PqIndex.TrainCap]]-vector sample, encoding rides the scan
  * map-side, and the block ADC scoring is a crossJoin against the
  * broadcast Q-row LUT frame (per-query M×K dot tables as map literals
  * — constant-size metadata) with a per-query WindowGroupLimit
  * shortlist. Nothing corpus-sized broadcasts, shuffles carry ids and
  * doubles only.
  *
  * Declared rows-only (iterative k-means training — the PqIndex
  * precedent); PqTuneSpec gates the frontier's algebraic invariants
  * (two-stage recall ≡ shortlist containment under exact rerank — a
  * theorem, not a data property) and the measured byte/recall dominance
  * at small SFs.
  */
object PqTune {

  /** Candidate subquantizer counts; 64 must divide evenly (subDim =
    * 64/m). m IS the stored bytes/vector (one byte code per subspace),
    * so the ladder spans 128×..16× compression. */
  val Ms: Seq[Int] = Seq(2, 4, 8, 16)

  /** Per-query ADC lookup tables for a query BLOCK as a broadcastable
    * frame: (q_id, lut) where lut = map(sub_id → map(cent_id → dot(q_sub,
    * centroid))) — maps rather than positional arrays so clusters Lloyd
    * dropped simply have no key (stored codes never reference them). */
  private def lutFrame(qs: DataFrame, cb: DataFrame, m: Int,
                       subDim: Int): DataFrame = {
    val qsubs = PqIndex.subvectors(
      qs.select(col("q_id").as("vec_id"), col("q_embedding").as("embedding")),
      m, subDim)
      .withColumnRenamed("vec_id", "q_id")
    qsubs.join(broadcast(cb), Seq("sub_id"))
      .select(col("q_id"), col("sub_id"),
        col("cent_id").cast("int").as("cent_id"),
        dotProduct(col("sv"), col("c_sv")).as("p"))
      .groupBy(col("q_id"), col("sub_id"))
      .agg(map_from_entries(collect_list(struct(col("cent_id"), col("p"))))
        .as("mp"))
      .groupBy(col("q_id"))
      .agg(map_from_entries(collect_list(struct(col("sub_id"), col("mp"))))
        .as("lut"))
  }

  /** Σₘ lut[m][code[m]] against the joined-in per-query LUT column. */
  private def adcScore(lutCol: Column): Column =
    aggregate(
      transform(col("code"),
        (c, i) => element_at(element_at(lutCol, i), c.cast("int"))),
      lit(0.0), (acc, x) => acc + x)

  /** The family-shared deterministic query block plus the ONE exact pass
    * ((q_id, vec_id, score) pairs — the brute truth and every candidate's
    * rerank source) and its top-10 truth. */
  private[operators] def sampleAndTruth(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val qs = emb
      .filter(col("vec_id") >= 16 &&
        col("vec_id") % IvfTune.TuneSampleMod === IvfTune.TuneSampleRes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
        col("vec_norm").as("q_norm"))
    val pairs = emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", KnnSearch.prenormedScore)
      .select(col("q_id"), col("vec_id"), col("score"))
      .localCheckpoint(eager = true)
    val brute = pairs
      .withColumn("r", row_number().over(rankWindow)).filter(col("r") <= 10)
      .select(col("q_id"), col("vec_id"))
      .localCheckpoint(eager = true)
    (qs, pairs, brute)
  }

  private def rankWindow =
    Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))

  /** One candidate's ADC scores for every (query, vector) pair: train at
    * m subspaces, encode, score map-side against the broadcast LUT frame
    * — the block-scoring core shared with the joint IVF-PQ sweep
    * ([[IvfPqTune]], which restricts the SAME scores to probed buckets). */
  private[operators] def adcPairs(spark: SparkSession, dir: String,
                                  qs: DataFrame, m: Int): DataFrame = {
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val subDim = 64 / m
    val cb = PqIndex.trainCodebooks(emb, m, subDim)
    PqIndex.encode(emb, cb, m, subDim)
      .crossJoin(broadcast(lutFrame(qs, cb, m, subDim)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcScore(col("lut")))
      .select(col("q_id"), col("vec_id"), col("adc"))
  }

  /** One candidate's ADC shortlist for the whole block: the per-query
    * top-[[PqIndex.Shortlist]] of [[adcPairs]]. */
  private[operators] def shortlistFor(spark: SparkSession, dir: String,
                                      qs: DataFrame, m: Int): DataFrame = {
    val aw = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    adcPairs(spark, dir, qs, m)
      .withColumn("r", row_number().over(aw))
      .filter(col("r") <= PqIndex.Shortlist)
      .select(col("q_id"), col("vec_id"))
  }

  /** Exact rerank of a shortlist from the materialized pair frame (no
    * re-scoring) → per-query top-10 → hits against the brute truth. */
  private[operators] def rerankHits(shortlist: DataFrame, pairs: DataFrame,
                                    brute: DataFrame): DataFrame =
    shortlist
      .join(pairs, Seq("q_id", "vec_id"))
      .withColumn("r", row_number().over(rankWindow)).filter(col("r") <= 10)
      .join(brute, Seq("q_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))

  /** Q-pq-tune: the recall/bytes frontier. One row per candidate m —
    * (m, code_bytes, compression, n_q, n_hits, recall_10, chosen). */
  def pqTune(spark: SparkSession, dir: String): DataFrame = {
    val (qs, pairs, brute) = sampleAndTruth(spark, dir)
    val nq = qs.agg(count(lit(1)).as("n_q"))
    val sweep = Ms.map { m =>
      rerankHits(shortlistFor(spark, dir, qs, m), pairs, brute)
        .crossJoin(nq)
        .select(lit(m).as("m"), lit(m).as("code_bytes"),
          round(lit(256.0 / m), 6).as("compression"),
          col("n_q"), col("n_hits"),
          round(col("n_hits").cast("double") /
            (col("n_q") * 10).cast("double"), 6).as("recall_10"))
    }.reduce(_ unionByName _)
    sweep
      .withColumn("chosen",
        col("m") === min(when(col("recall_10") >= IvfTune.TuneTarget,
          col("m"))).over(Window.partitionBy()))
      .orderBy(col("m"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pq_tune" -> (pqTune _))

  /** Rows-only by design (k-means training, the PqIndex precedent);
    * PqTuneSpec gates the frontier's invariants. */
  def oracles: Map[String, String] = Map.empty
}
