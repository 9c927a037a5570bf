package graft.operators

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for cosine ANN — the bucketed alternative to
  * [[IvfIndex]] (SURVEY.md north-star: "an IVF or LSH-bucketed variant as
  * the scale path").
  *
  * Each of 8 hyperplanes contributes one signature bit: the sign of the
  * vector's projection onto a fixed ±1 plane. Vectors with equal 8-bit
  * signatures land in the same bucket (256 buckets); a query searches only
  * its own bucket. P(bit agrees) = 1 − θ/π per the SimHash/rp-LSH bound,
  * so near neighbors collide with high probability. At 100 TB the bucket
  * id is a partition column — the search prunes to 1/256 of the index
  * before any scoring.
  *
  * The planes are deterministic: an LCG over (plane, dim) generates ±1
  * components ONCE in Scala, embedded as array literals in both the Spark
  * plan and the oracle SQL — no cross-engine arithmetic to diverge.
  * Projections use the native [[graft.functions.DotProduct]] (sequential
  * double accumulation, same order as DuckDB's list_sum).
  */
object RandomHyperplaneLsh {
  val Planes = 8

  /** ±1 hyperplane components from an LCG over the flattened (p, d) index
    * (bit 16 — the low bit of an LCG alternates and must not be used). */
  def planeSigns(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      val i = p.toLong * dim + d
      val a = (1103515245L * (i + 1) + 12345L) % 2147483648L
      if ((a / 65536) % 2 == 0) 1.0 else -1.0
    }

  /** 8-bit bucket id of a vector column. */
  def bucket(embedding: Column, dim: Int): Column =
    (0 until Planes).map { p =>
      val proj = VectorFunctions.dotProduct(embedding,
        typedLit(planeSigns(p, dim)))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Driver-side bucket of ONE query vector — the same arithmetic as
    * [[bucket]] (sequential left-to-right float→double accumulation,
    * matching [[graft.functions.DotProduct]] exactly), computed in plain
    * Scala. A point query's vector is driver-resident by definition (the
    * reference posts it in the HTTP body, `main.go:101-106`); knowing its
    * bucket BEFORE planning turns the probe restriction into a literal
    * partition filter on a persisted bucket-partitioned index. */
  def bucketOf(vec: Array[Float]): Long =
    (0 until Planes).map { p =>
      val signs = planeSigns(p, vec.length)
      var s = 0.0
      var d = 0
      while (d < vec.length) { s += vec(d).toDouble * signs(d); d += 1 }
      if (s > 0) 1L << p else 0L
    }.sum

  /** ANN top-K: exact cosine ranking restricted to the query's bucket. */
  def search(index: DataFrame, query: DataFrame, dim: Int, k: Int): DataFrame = {
    val bucketed = index.withColumn("bucket", bucket(col("embedding"), dim))
    val q = query
      .withColumn("q_bucket", bucket(col("q_embedding"), dim))
      .withColumn("q_norm", VectorFunctions.l2Norm(col("q_embedding")))
    KnnSearch.rankTopK(
      bucketed
        .crossJoin(broadcast(q))
        .filter(col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .withColumn("score", KnnSearch.prenormedScore)
        .select(col("vec_id"), col("label"), col("bucket"), col("score")),
      "vec_id", k)
  }

  /** Probe list for multi-probe search: the query's own bucket plus its
    * `Planes` hamming-1 neighbors. A near neighbor that falls just across
    * ONE hyperplane — the single-probe recall cliff — lands in exactly
    * such a neighbor bucket, and P(≥2 flipped planes) decays
    * quadratically for small angles. Scan fraction: 9/256 of the index
    * instead of 1/256, still partition-pruned at scale. */
  def probeBuckets(qBucket: Column): Column =
    array(Seq(qBucket) ++
      (0 until Planes).map(p => qBucket.bitwiseXOR(lit(1L << p))): _*)

  /** Multi-probe ANN top-K: exact cosine ranking over the query's bucket
    * and its hamming-1 neighbor buckets. Buckets are disjoint, so the
    * probe join introduces no duplicate candidates. */
  def searchMultiProbe(index: DataFrame, query: DataFrame, dim: Int, k: Int): DataFrame = {
    val bucketed = index.withColumn("bucket", bucket(col("embedding"), dim))
    val q = query
      .withColumn("q_bucket", bucket(col("q_embedding"), dim))
      .withColumn("q_norm", VectorFunctions.l2Norm(col("q_embedding")))
      .withColumn("probe", explode(probeBuckets(col("q_bucket"))))
    KnnSearch.rankTopK(
      bucketed
        .join(broadcast(q),
          col("bucket") === col("probe") && col("vec_id") =!= col("q_id"))
        .withColumn("score", KnnSearch.prenormedScore)
        .select(col("vec_id"), col("label"), col("bucket"), col("score")),
      "vec_id", k)
  }

  /** Q-ann-lsh: bucket of vector 0, top-5 within it. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val index = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    search(index, q, dim = 64, k = 5)
  }

  private def signsSqlList(p: Int): String =
    planeSigns(p, 64).map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** The bucket arithmetic as DuckDB SQL — shared by every oracle that
    * must reproduce [[bucket]] bit-for-bit (q_ann_lsh*, q_knn_join_large). */
  def bucketSqlPublic(emb: String): String = bucketSql(emb)

  private def bucketSql(emb: String): String =
    (0 until Planes).map { p =>
      s"""CASE WHEN list_sum(list_transform($emb, (x,i) ->
         |  CAST(x AS DOUBLE) * (${signsSqlList(p)})[i])) > 0
         |  THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"""
        .stripMargin.replace("\n", " ")
    }.mkString("(", " + ", ")")

  val annLshSql: String = {
    import VectorSql.{cosine => cos}
    s"""WITH b AS (SELECT vec_id, label, embedding,
       |             ${bucketSql("embedding")} AS bucket
       |           FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qe, ${bucketSql("embedding")} AS q_bucket
       |      FROM embeddings WHERE vec_id = 0)
       |SELECT b.vec_id, b.label, b.bucket,
       |  ROUND(${cos("b.embedding", "q.qe")}, 6) AS score
       |FROM b, q
       |WHERE b.bucket = q.q_bucket AND b.vec_id <> q.q_id
       |ORDER BY score DESC, b.vec_id LIMIT 5""".stripMargin
  }

  /** Q-ann-lsh-persisted: the SAME search as q_ann_lsh, but against a
    * PERSISTED index whose LSH bucket is a physical partition column
    * (`IndexCatalog.createIfAbsent(..., Seq("label", "bucket"))`). The
    * query's bucket is computed driver-side ([[bucketOf]]) and passed to
    * `IndexCatalog.search` as a literal probe set, so the restriction is a
    * PartitionFilter — the scan lists only the `bucket=N` directories and
    * reads ~1/256 of the index, where q_ann_lsh's in-memory filter reads
    * all of it. Identical results to q_ann_lsh (same oracle SQL): the
    * persisted layout changes the ACCESS PATH, never the answer.
    *
    * Partitioned by `bucket` ALONE (256 directories): the LSH probe never
    * filters on label, so a label level would multiply the directory count
    * by the label cardinality for zero pruning benefit — partition-count
    * budget spent where the queries prune. (The IVF twin keeps
    * label+bucket as the namespace-scoped layout.) */
  private def ensureLshBucketed(spark: SparkSession, dir: String): (String, String) = {
    import graft.sources.IndexCatalog
    val base = IndexCatalog.cacheBase(dir)
    val name = "emb-lsh-bucketed"
    if (!IndexCatalog.exists(base, name)) {
      val data = Tables.embeddings(spark, dir)
        .withColumn("bucket", bucket(col("embedding"), 64))
      IndexCatalog.createIfAbsent(spark, base,
        IndexCatalog.IndexDescriptor(name, 64, "cosine"), data,
        partitionCols = Seq("bucket"))
    }
    (base, name)
  }

  def annLshPersisted(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val (base, name) = ensureLshBucketed(spark, dir)
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val qVec = q.head().getSeq[Float](1).toArray
    IndexCatalog.search(spark, base, name, q, k = 5, buckets = Seq(bucketOf(qVec)))
  }

  /** Q-lsh-auto: [[graft.plans.AnnRouting]] generalized to the SECOND
    * index family — the same naive `ORDER BY cosine DESC LIMIT k` SQL as
    * q_knn_auto, over the LSH-bucket-partitioned persisted index. The
    * rule's probe model here needs NO sidecar: the query's bucket and its
    * hamming-1 neighbors derive from the deterministic plane constants at
    * plan time (nprobe=9, the multi-probe set), and the injected
    * `bucket IN (...)` filter prunes to 9/256 partition directories.
    * Shares q_ann_lsh_mp's oracle: the routed naive plan must equal the
    * programmatic multi-probe API exactly. */
  private[graft] def lshAutoFrame(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val (base, name) = ensureLshBucketed(spark, dir)
    graft.plans.GraftExtensions.register(spark)
    IndexCatalog.load(spark, base, name).createOrReplaceTempView("emb_lsh_indexed")
    val qVec = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val qLit = VectorOps.floatArraySqlLiteral(qVec)
    spark.sql(
      s"""SELECT vec_id, label, CAST(bucket AS BIGINT) AS bucket,
         |  ROUND(${VectorOps.sparkCosineSql("embedding", qLit)}, 6) AS score
         |FROM emb_lsh_indexed WHERE vec_id <> 0
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin)
  }

  def lshAuto(spark: SparkSession, dir: String): DataFrame = {
    val (base, name) = ensureLshBucketed(spark, dir)
    graft.plans.AnnRouting.withRoute(spark, base, name,
      nprobe = 1 + Planes, kind = "lsh")(lshAutoFrame(spark, dir))
  }

  /** Q-ann-lsh-mp: the multi-probe variant of q_ann_lsh — same query
    * vector, 9 probed buckets. */
  def annLshMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    val index = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    searchMultiProbe(index, q, dim = 64, k = 5)
  }

  val annLshMultiProbeSql: String = {
    import VectorSql.{cosine => cos}
    val probeList = ("q_bucket" +:
      (0 until Planes).map(p => s"xor(q_bucket, ${1L << p})")).mkString("[", ", ", "]")
    s"""WITH b AS (SELECT vec_id, label, embedding,
       |             ${bucketSql("embedding")} AS bucket
       |           FROM embeddings),
       |q0 AS (SELECT vec_id AS q_id, embedding AS qe, ${bucketSql("embedding")} AS q_bucket
       |       FROM embeddings WHERE vec_id = 0),
       |probes AS (SELECT q_id, qe, unnest($probeList) AS probe FROM q0)
       |SELECT b.vec_id, b.label, b.bucket,
       |  ROUND(${cos("b.embedding", "p.qe")}, 6) AS score
       |FROM b JOIN probes p ON b.bucket = p.probe AND b.vec_id <> p.q_id
       |ORDER BY score DESC, b.vec_id LIMIT 5""".stripMargin
  }

  /** PlanDump-only lazy routed frame (see VectorOps.planFrames). */
  private[graft] def planFrames: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lsh_auto" -> ((s: SparkSession, d: String) => {
      val (base, name) = ensureLshBucketed(s, d)
      graft.plans.AnnRouting.register(s, base, name, nprobe = 1 + Planes, kind = "lsh")
      lshAutoFrame(s, d)
    }))

  private[graft] def dropPlanRoutes(spark: SparkSession, dir: String): Unit = {
    val (base, name) = ensureLshBucketed(spark, dir)
    graft.plans.AnnRouting.unregister(spark, base, name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_lsh" -> (annLsh _),
    "q_ann_lsh_persisted" -> (annLshPersisted _),
    "q_ann_lsh_mp" -> (annLshMultiProbe _),
    "q_lsh_auto" -> (lshAuto _))

  def oracles: Map[String, String] = Map(
    "q_ann_lsh" -> annLshSql,
    // same oracle as q_ann_lsh: the persisted bucket-partitioned layout
    // changes the access path (partition pruning), never the result
    "q_ann_lsh_persisted" -> annLshSql,
    "q_ann_lsh_mp" -> annLshMultiProbeSql,
    // the optimizer-routed naive SQL must equal the multi-probe API
    "q_lsh_auto" -> annLshMultiProbeSql)
}
