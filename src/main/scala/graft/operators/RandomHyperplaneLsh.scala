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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_lsh" -> (annLsh _),
    "q_ann_lsh_mp" -> (annLshMultiProbe _))

  def oracles: Map[String, String] = Map(
    "q_ann_lsh" -> annLshSql,
    "q_ann_lsh_mp" -> annLshMultiProbeSql)
}
