package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ JOINT TUNING — the composed layout's two dials swept TOGETHER:
  * a real IVF-PQ deployment (q_ivfpq_knn / q_ivfpq_persisted) sets both
  * the probe depth (scan cost) and the subquantizer count (memory cost),
  * and the dials interact — a deeper probe admits more candidates into a
  * FIXED-size ADC shortlist, so coarse codes can crowd true neighbors
  * out of a larger candidate pool (recall is NOT theorem-monotone in
  * nprobe at fixed m, unlike the exact-scoring q_nprobe_tune where the
  * superset theorem holds; the per-cell measurement is the only honest
  * answer, which is why this query exists). One row per (nprobe, m)
  * cell: recall@10 of the full serving composition (probe → ADC
  * shortlist → exact rerank) against the GLOBAL brute truth, plus both
  * cost axes (scan_frac from the probe depth, code_bytes from m).
  *
  * `chosen` = the cell a recall-targeted deployment would dial in:
  * smallest probe depth at which ANY m clears [[IvfTune.TuneTarget]],
  * then the fewest code bytes at that depth — scan cost is the
  * per-query recurring cost, memory the standing one, so the
  * lexicographic order (scan, bytes) is the deployment's preference.
  *
  * Scale shape: ONE exact Q×N pass (the [[PqTune]] discipline — truth
  * AND rerank source) joined once against the probe ranking (prank) and
  * once per m against the map-side ADC scores; every cell evaluation is
  * a filter + window over that same materialized frame. Q is the
  * family-shared bounded sample; nothing corpus-sized broadcasts.
  * Rows-only by design (k-means training); IvfPqTuneSpec pins the
  * full-depth column to q_pq_tune's frontier (identical definitions
  * must produce identical numbers — a cross-query consistency theorem)
  * and gates the ladder/chosen contracts.
  */
object IvfPqTune {

  /** Probe-depth ladder (16 = every bucket — the full-scan column whose
    * cells must equal q_pq_tune's). */
  val Nprobes: Seq[Int] = Seq(1, 2, 4, 8, 16)

  /** The chosen cell of the live sweep — the measured side of the
    * serving-dial pin ([[PqIndex.TunedNprobe]]/[[PqIndex.TunedM]];
    * IvfPqTuneSpec gates the equality). */
  private[operators] def chosenCell(spark: SparkSession, dir: String): (Int, Int) = {
    val r = ivfPqTune(spark, dir).filter(col("chosen"))
      .select(col("nprobe"), col("m")).head()
    (r.getInt(0), r.getInt(1))
  }

  /** Q-ivfpq-tune: the joint frontier. Output one row per cell —
    * (nprobe, m, code_bytes, n_q, n_hits, recall_10, scan_frac, chosen). */
  def ivfPqTune(spark: SparkSession, dir: String): DataFrame = {
    val (qs, pairs0, brute) = PqTune.sampleAndTruth(spark, dir)
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val cent = VectorOps.seedCentroids(spark, dir)
    // probe order per query (shared by every m) and storage bucket per
    // vector — the q_nprobe_tune construction
    val pw = Window.partitionBy(col("q_id"))
      .orderBy(col("p_score").desc, col("cent_id"))
    val prank = qs.crossJoin(broadcast(cent))
      .withColumn("p_score", graft.functions.VectorFunctions.cosineSimPrenormed(
        graft.functions.VectorFunctions.dotProduct(col("c_embedding"), col("q_embedding")),
        col("c_norm"), col("q_norm")))
      .select(col("q_id"), col("cent_id"), row_number().over(pw).as("prank"))
    val asg = IvfIndex.assign(emb, cent).select(col("vec_id"), col("cent_id"))
    val pairs = pairs0
      .join(asg, Seq("vec_id"))
      .join(broadcast(prank), Seq("q_id", "cent_id"))
      .select(col("q_id"), col("vec_id"), col("score"), col("prank"))
      .localCheckpoint(eager = true)
    val nq = qs.agg(count(lit(1)).as("n_q"))
    val tot = pairs.agg(count(lit(1)).as("n_pairs"))
    val rw = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val cells = PqTune.Ms.map { m =>
      // this m's ADC scores for the whole block, joined onto the pair
      // frame once (ids+doubles; the shortlist below re-filters per cell)
      val adc = PqTune.adcPairs(spark, dir, qs, m)
      val scored = pairs.join(adc, Seq("q_id", "vec_id"))
        .localCheckpoint(eager = true)
      Nprobes.map { n =>
        val cand = scored.filter(col("prank") <= n)
        val nCand = cand.agg(count(lit(1)).as("n_cand"))
        val aw = Window.partitionBy(col("q_id"))
          .orderBy(col("adc").desc, col("vec_id"))
        cand
          .withColumn("ar", row_number().over(aw))
          .filter(col("ar") <= PqIndex.Shortlist)
          .withColumn("r", row_number().over(rw)).filter(col("r") <= 10)
          .join(brute, Seq("q_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
          .crossJoin(nq).crossJoin(nCand).crossJoin(tot)
          .select(lit(n).as("nprobe"), lit(m).as("m"),
            lit(m).as("code_bytes"), col("n_q"), col("n_hits"),
            round(col("n_hits").cast("double") /
              (col("n_q") * 10).cast("double"), 6).as("recall_10"),
            round(col("n_cand").cast("double") /
              col("n_pairs").cast("double"), 6).as("scan_frac"))
      }.reduce(_ unionByName _)
    }.reduce(_ unionByName _)
    // chosen: smallest clearing nprobe, then fewest bytes at that depth
    val all = Window.partitionBy()
    cells
      .withColumn("minprobe", min(when(col("recall_10") >= IvfTune.TuneTarget,
        col("nprobe"))).over(all))
      .withColumn("chosen",
        col("nprobe") === col("minprobe") &&
          col("m") === min(when(col("recall_10") >= IvfTune.TuneTarget &&
            col("nprobe") === col("minprobe"), col("m"))).over(all))
      .drop("minprobe")
      .orderBy(col("nprobe"), col("m"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ivfpq_tune" -> (ivfPqTune _))

  /** Rows-only (k-means training, the PqIndex precedent); IvfPqTuneSpec
    * pins the full-depth column to q_pq_tune and gates the contracts. */
  def oracles: Map[String, String] = Map.empty
}
