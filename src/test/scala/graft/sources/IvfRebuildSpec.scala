package graft.sources

import graft.SparkSpecBase
import graft.operators.VectorOps
import graft.plans.AnnRouting
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the IVF rebuild/rebalance operator (Maintenance.rebuildIvf /
  * q_ivf_rebuild) — the actuator closing the q_ivf_drift monitor loop:
  * planted drift must be repaired, no vector may be lost or duplicated by
  * the rewrite, and a LIVE AnnRouting route must serve the new layout
  * immediately after the rebuild (the centroid-cache invalidation the r9
  * verdict required of this operator). */
class IvfRebuildSpec extends SparkSpecBase with Matchers {

  private def bucketInValues(df: DataFrame): Seq[Long] =
    df.queryExecution.optimizedPlan.collect {
      case Filter(cond, _) => cond.collect {
        case In(a: AttributeReference, vs) if a.name == "bucket" =>
          vs.map(_.eval().asInstanceOf[Number].longValue)
      }
    }.flatten.flatten

  private def plantDrifted(base: String, name: String): Unit = {
    val emb = graft.Tables.embeddings(spark, sfDir)
    IndexCatalog.createIfAbsent(spark, base,
      IndexCatalog.IndexDescriptor(name, 64, "cosine"),
      emb.withColumn("bucket", least(col("vec_id"), lit(3L))),
      partitionCols = Seq("bucket"))
    IndexCatalog.writeCentroids(spark, base, name,
      emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")))
  }

  test("planted drift is repaired; a live route serves the new layout") {
    import graft.functions.VectorFunctions._
    val base = graft.Scratch.dir("rebuild-spec")
    val name = "drifted"
    val emb = graft.Tables.embeddings(spark, sfDir)
    plantDrifted(base, name)
    val nVectors = emb.count()

    val before = VectorOps.balanceTable(
      IndexCatalog.load(spark, base, name)).collect()
    before.length shouldBe 4
    val maxBefore = before.map(_.getAs[Double]("balance")).max
    assert(maxBefore > VectorOps.IvfBalanceThreshold,
      s"drift not planted (max balance $maxBefore)")

    // register the route and run one routed query so the STALE sidecar
    // (4 centroids) is cached on the driver
    AnnRouting.register(spark, base, name, nprobe = 4)
    val qVec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    def routedTop(k: Int): DataFrame =
      IndexCatalog.load(spark, base, name)
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("bucket").cast("long").as("b"),
          round(cosineSim(col("embedding"), typedlit[Seq[Float]](qVec)), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(k)
    val pre = routedTop(5)
    bucketInValues(pre) should not be empty
    pre.collect().length shouldBe 5

    Maintenance.rebuildIvf(spark, base, name,
      emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 80)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")))

    val rebuilt = IndexCatalog.load(spark, base, name)
    val after = VectorOps.balanceTable(rebuilt).collect()
    after.length shouldBe 16
    val maxAfter = after.map(_.getAs[Double]("balance")).max
    assert(maxAfter < maxBefore, "rebuild did not improve balance")
    // the rewrite must preserve the vector set exactly
    rebuilt.count() shouldBe nVectors
    rebuilt.select(countDistinct(col("vec_id"))).head().getLong(0) shouldBe nVectors

    // the SAME routed query now probes the NEW sidecar — a stale cached
    // codebook would still emit old bucket ids (0..3)
    val post = routedTop(5)
    val buckets = bucketInValues(post)
    buckets should not be empty
    buckets.foreach { b =>
      withClue(s"probe bucket $b is not a stride centroid id:") {
        b % 5 shouldBe 0L
        b should be <= 75L
      }
    }
    // and the routed result equals exact scoring within the probed dirs
    val expected = IndexCatalog.loadBuckets(spark, base, name, buckets)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("bucket").cast("long").as("b"),
        round(cosineSim(col("embedding"), typedlit[Seq[Float]](qVec)), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(5)
    post.collect().map(_.toSeq) should contain theSameElementsInOrderAs
      expected.collect().map(_.toSeq)
    // the rewritten sidecar must keep the MIPS residual column — without
    // it every rebuilt index silently declines dot routing forever
    val sidecar = spark.read.parquet(
      java.nio.file.Paths.get(base, name, "centroids").toString)
    sidecar.columns should contain("c_maxresid")
    sidecar.filter(col("c_maxresid") < 0.0).count() shouldBe 0
    // a bare-dot DESC sort over the rebuilt index routes (bucket filter
    // present), proving the residuals are live end-to-end
    import graft.functions.VectorFunctions.dotProduct
    val dotTop = IndexCatalog.load(spark, base, name)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        dotProduct(col("embedding"), typedlit[Seq[Float]](qVec)).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(5)
    bucketInValues(dotTop) should not be empty
    AnnRouting.unregister(spark, base, name)
  }

  test("trained rebuild: the k-means path restores balance and preserves the corpus") {
    val base = graft.Scratch.dir("rebuild-trained-spec")
    val name = "drifted-t"
    val emb = graft.Tables.embeddings(spark, sfDir)
    plantDrifted(base, name)
    val maxBefore = VectorOps.balanceTable(IndexCatalog.load(spark, base, name))
      .collect().map(_.getAs[Double]("balance")).max

    Maintenance.rebuildIvfTrained(spark, base, name, k = 8, iterations = 2)

    val rebuilt = IndexCatalog.load(spark, base, name)
    val after = VectorOps.balanceTable(rebuilt).collect()
    // Lloyd may drop empty clusters — k is an upper bound
    after.length should be > 1
    after.length should be <= 8
    after.map(_.getAs[Double]("balance")).max should be < maxBefore
    rebuilt.count() shouldBe emb.count()
    // search over the rebuilt index still answers under its declared
    // metric (full-scan form: rebuild changes layout, never content)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val hits = IndexCatalog.search(spark, base, name, q, k = 5).collect()
    hits.length shouldBe 5
  }
}
