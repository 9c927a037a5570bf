package graft.plans

import graft.{SparkSpecBase, Tables}
import graft.operators.Metrics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class ExtensionsAndMetricsSpec extends SparkSpecBase with Matchers {

  test("GraftExtensions exposes the native expressions to pure SQL") {
    // Force a genuinely new session: with an active session present,
    // getOrCreate returns it and silently ignores withExtensions.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    try {
      Tables.embeddings(s, sfDir).createOrReplaceTempView("emb")
      val r = s.sql(
        """SELECT vec_id,
          |  round(vec_dot(embedding, embedding), 6) AS selfdot,
          |  round(vec_l2norm(embedding) * vec_l2norm(embedding), 6) AS normsq,
          |  vec_l2dist(embedding, embedding) AS selfdist,
          |  size(word_ngram_shingles('a b c d', 3)) AS n_shingles,
          |  size(feature_hash_embed('hello world', 32)) AS dim
          |FROM emb WHERE vec_id = 1""".stripMargin).head()
      r.getDouble(1) shouldBe r.getDouble(2) // |v|² == v·v
      r.getDouble(3) shouldBe 0.0
      r.getInt(4) shouldBe 2
      r.getInt(5) shouldBe 32
    } finally {
      // do not stop() (SparkContext is shared); restore the suite session
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("GraftExtensions.register wires the same functions into a live session") {
    GraftExtensions.register(spark)
    spark.sql("SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .head().getDouble(0) shouldBe 11.0
    // the text/hash kernels are SQL-reachable too
    val r = spark.sql(
      """SELECT md5_prefix48('abc') AS h,
        |  size(winnow_fingerprints('abcdefghij', 5, 4)) AS n_fps,
        |  char_entropy_stats('aabb').n AS n,
        |  char_entropy_stats('aabb').distinct_chars AS d,
        |  round(ln(char_entropy_stats('aabb').n)
        |        - char_entropy_stats('aabb').sum_clnc / char_entropy_stats('aabb').n, 6) AS h2
        |""".stripMargin).head()
    r.getLong(0) shouldBe java.lang.Long.parseLong("900150983cd2", 16)
    assert(r.getInt(1) >= 1)
    r.getLong(2) shouldBe 4L
    r.getLong(3) shouldBe 2L
    r.getDouble(4) shouldBe math.log(2.0) +- 1e-6 // uniform over 2 chars
    // pq_encode: 1 subspace of dim 2, centroids (0,0) and (1,1) —
    // (0.9,0.9) is nearest centroid 1
    spark.sql(
      """SELECT pq_encode(array(0.9D, 0.9D),
        |  array(0.0D, 0.0D, 1.0D, 1.0D), 1, 2, 2) AS code""".stripMargin)
      .head().getSeq[Byte](0) shouldBe Seq(1.toByte)
    // un-suffixed literals parse as DECIMAL — the registration must cast,
    // not blind-cast-crash
    spark.sql(
      "SELECT pq_encode(array(0.9D, 0.9D), array(0.0, 0.0, 1.0, 1.0), 1, 2, 2) AS code")
      .head().getSeq[Byte](0) shouldBe Seq(1.toByte)
    // a non-literal codebook is rejected with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT pq_encode(embedding, embedding, 8, 16, 8) FROM " +
        s"parquet.`$sfDir/embeddings.parquet` LIMIT 1").head()
    }
    err.getMessage should include("foldable array literal")
  }

  test("a null array ELEMENT nulls the result instead of crashing or reading 0") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS d,
        |       vec_l2norm(array(CAST(NULL AS FLOAT))) AS n""".stripMargin).head()
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
  }

  test("observe() counters reconcile: processed == ok + failures (ref embed.go:130)") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(lit("[09.09.23, 14:35:02] ~ u: "), col("text")))
          .otherwise(col("text")))
    val (observed, obs) = Metrics.observeParse(docs)
    val total = observed.count()
    val m = obs.get
    m("lines_processed") shouldBe total
    m("parse_ok").asInstanceOf[Long] + m("parse_failures").asInstanceOf[Long] shouldBe total
    m("parse_ok").asInstanceOf[Long] should be > 0L
    m("parse_failures").asInstanceOf[Long] should be > 0L
  }
}
