package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: partition the index into
  * centroid buckets, search only the query's closest buckets.
  *
  * This is the sub-linear scale path past brute-force kNN: at 100 TB the
  * index is stored `partitionBy(cluster_id)`, a query scores the (tiny,
  * broadcast) centroid table first, and the bucket filter becomes Parquet
  * partition pruning — the scan reads nprobe/k of the data. Recall is
  * tunable via nprobe exactly as in published IVF systems (the reference
  * delegates this wholesale to Pinecone; `upsert/upsert.go:27`).
  *
  * Centroids here are caller-provided (deterministic: any stable subset or
  * offline k-means); training is out of scope.
  */
object IvfIndex {

  /** Assign every vector to its nearest centroid by cosine (ties → lowest
    * centroid id). One broadcast join + an argmax AGGREGATION — `min` of
    * `struct(-score, cent_id, payload…)`, whose lexicographic ordering
    * matches the old window's `ORDER BY c_score DESC, cent_id` for all
    * finite scores — so the k×-expanded candidate frame partial-aggregates
    * back to one row per vector map-side BEFORE the exchange, and nothing
    * sorts a k× frame. (The window form shuffled k candidate rows per
    * vector, each carrying the full embedding, then sorted them — k× the
    * exchange volume for the same result.)
    *
    * NaN edge (a zero-norm centroid or vector makes cosineSimPrenormed
    * 0/0 = NaN): Spark sorts NaN GREATEST, so the old `DESC` window put a
    * NaN-scored centroid FIRST while `min(struct(-score, …))` puts it
    * last — min(struct) is the sane behavior (never assign to an
    * unscorable centroid), and no zero-norm vectors exist in any caller's
    * data (embeddings are unit-normalized upstream), but the two forms
    * are NOT equivalent in that degenerate edge. */
  def assign(index: DataFrame, centroids: DataFrame): DataFrame = {
    // carry whatever payload the frame has (label, metadata, …) instead of
    // hard-coding a label column: k-means training runs on unlabeled
    // frames too, and the payload rides the struct without affecting the
    // argmax (ns + cent_id decide before any payload field compares)
    val payload = index.columns.toIndexedSeq.filterNot(_ == "vec_id")
    index
      .crossJoin(broadcast(centroids))
      .withColumn("c_score", cosineSimPrenormed(
        dotProduct(col("embedding"), col("c_embedding")),
        col("vec_norm"), col("c_norm")))
      .groupBy(col("vec_id"))
      .agg(min(struct(
        (-col("c_score")).as("ns") +: col("cent_id") +: payload.map(col): _*)).as("b"))
      .select(
        col("vec_id") +: payload.map(c => col(s"b.$c").as(c)) :+
          col("b.cent_id").as("cent_id"): _*)
  }

  /** Probe: the query's top-`nprobe` centroids. */
  def probes(centroids: DataFrame, query: DataFrame, nprobe: Int): DataFrame =
    centroids
      .crossJoin(broadcast(query))
      .withColumn("p_score", cosineSimPrenormed(
        dotProduct(col("c_embedding"), col("q_embedding")),
        col("c_norm"), col("q_norm")))
      .orderBy(col("p_score").desc, col("cent_id"))
      .limit(nprobe)
      .select(col("cent_id"))

  /** Lloyd's k-means for centroid training (replaces the deterministic
    * lowest-id seed centroids with data-adapted ones). Each iteration is
    * one assign (broadcast centroids, map-side scoring) plus one typed
    * [[graft.api.Typed.VectorMean]] aggregation — an `Aggregator[IN,BUF,
    * OUT]` with element-wise partial merge, so the centroid update
    * combines map-side like any built-in agg. Empty clusters drop (k may
    * shrink), standard Lloyd behavior. */
  def trainCentroids(emb: DataFrame, k: Int, dim: Int, iterations: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val indexed = KnnSearch.withNorm(emb)
    var cent = KnnSearch.withNorm(
      emb.filter(col("vec_id") < k)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")),
      "c_embedding").withColumnRenamed("vec_norm", "c_norm")
    val mean = new graft.api.Typed.VectorMean(dim).toColumn
    for (_ <- 1 to iterations) {
      val assigned = assign(indexed, cent)
      val next = KnnSearch.withNorm(
        assigned.select(col("cent_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .groupByKey(_._1).mapValues(_._2)
          .agg(mean.name("c_embedding"))
          .toDF("cent_id", "c_embedding"),
        "c_embedding").withColumnRenamed("vec_norm", "c_norm")
      // Truncate lineage each iteration: chaining iterations on lineage
      // would nest every prior crossJoin + window + aggregation into one
      // plan, growing analysis/codegen cost per iteration. localCheckpoint
      // materializes the (k-row) centroid table on the executors — no rows
      // move through the driver, unlike a collect()/createDataFrame round
      // trip, so the pattern holds for large k.
      cent = next.localCheckpoint(eager = true)
    }
    cent
  }

  /** ANN top-K: exact scoring restricted to the probed buckets (shared
    * kernel: KnnSearch.prenormedScore/rankTopK). `candidateFilter`
    * restricts candidates BEFORE ranking (the KnnSearch.knnJoin
    * discipline — metadata-filtered search rides the SAME pipeline, so a
    * kernel/tie-break change can never desynchronize the filtered and
    * unfiltered families). */
  def search(assigned: DataFrame, centroids: DataFrame, query: DataFrame,
             nprobe: Int, k: Int,
             candidateFilter: Column = lit(true)): DataFrame =
    KnnSearch.rankTopK(
      assigned
        .join(broadcast(probes(centroids, query, nprobe)), Seq("cent_id"))
        .filter(candidateFilter)
        .crossJoin(broadcast(query))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("score", KnnSearch.prenormedScore)
        .select(col("vec_id"), col("label"), col("cent_id"), col("score")),
      "vec_id", k)
}
