package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the oracle-inexpressible PQ search: code shape, determinism,
  * and recall@10 against exact brute force (the LshRecallSpec discipline —
  * an ANN path must prove its approximation quality, not just run). */
class PqIndexSpec extends SparkSpecBase with Matchers {

  test("codes are M small ints per vector, one row per vector") {
    val emb = Tables.embeddings(spark, sfDir)
    val cb = PqIndex.trainCodebooks(emb)
    val codes = PqIndex.encode(emb, cb).collect()
    codes.length shouldBe emb.count()
    codes.foreach { r =>
      val code = r.getSeq[Byte](1)
      code.length shouldBe PqIndex.M
      all(code) should (be >= 0.toByte and be < PqIndex.K.toByte)
    }
    // the codebook is actually used: vectors spread over many codewords
    codes.map(_.getSeq[Byte](1)).distinct.length should be > codes.length / 4
  }

  test("pq search is deterministic and recalls most of the exact top-10") {
    val a = PqIndex.pqKnn(spark, sfDir).collect()
    val b = PqIndex.pqKnn(spark, sfDir).collect()
    a.map(_.toString) shouldBe b.map(_.toString) // deterministic seeds + Lloyd
    a.length shouldBe 10
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, sfDir))
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val exact = KnnSearch.topK(emb, q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = a.map(_.getAs[Long]("vec_id")).toSet
    // 8-byte codes + 50-deep rerank on 500 vectors: expect high overlap
    (got intersect exact).size.toDouble / 10.0 should be >= 0.8
    // rerank outputs exact cosine scores in descending order
    val scores = a.map(_.getAs[Double]("score"))
    scores.toSeq shouldBe scores.sorted.reverse.toSeq
  }

  test("ivf-pq search stays inside probed buckets and recalls the exact-scoring IVF result") {
    val a = PqIndex.ivfPqKnn(spark, sfDir).collect()
    val b = PqIndex.ivfPqKnn(spark, sfDir).collect()
    a.map(_.toString) shouldBe b.map(_.toString) // deterministic seeds + Lloyd
    a.length shouldBe 10
    // nprobe=4: every result must come from one of at most 4 coarse buckets
    a.map(_.getAs[Long]("cent_id")).distinct.length should be <= 4
    // the exact-scoring IVF search over the SAME probed buckets (q_ann_ivf)
    // is the reference result the PQ approximation + rerank must recover
    val exact = VectorOps.annIvf(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = a.map(_.getAs[Long]("vec_id")).toSet
    (got intersect exact).size.toDouble / 10.0 should be >= 0.8
    val scores = a.map(_.getAs[Double]("score"))
    scores.toSeq shouldBe scores.sorted.reverse.toSeq
  }

  test("persisted ivf-pq search equals the in-memory composition") {
    // deterministic centroids + deterministic Lloyd → the on-disk codes
    // agree with a fresh in-memory build, so the two access paths must
    // return identical rows (the q_ann_ivf vs q_ann_ivf_persisted parity)
    val disk = PqIndex.ivfPqPersisted(spark, sfDir).collect().map(_.toString)
    val mem = PqIndex.ivfPqKnn(spark, sfDir).collect().map(_.toString)
    disk shouldBe mem
  }

  test("q_ivfpq_upsert: twin of the query vector lands at rank 1 and the shared cache stays untouched") {
    import java.nio.file.{Files, Paths}
    PqIndex.ivfPqPersisted(spark, sfDir).collect()
    val cacheData = Paths.get(graft.sources.IndexCatalog.cacheBase(sfDir),
      "emb-ivfpq-bucketed", "data")
    val before = Files.getLastModifiedTime(cacheData)
    val rows = PqIndex.ivfPqUpsert(spark, sfDir).collect()
    Files.getLastModifiedTime(cacheData) shouldBe before
    rows should have length 10
    // vec 0's twin is an identical vector: exact rerank must rank it first
    rows.head.getAs[Long]("vec_id") shouldBe PqIndex.UpsertIdOffset
    rows.head.getAs[Double]("score") shouldBe 1.0 +- 1e-6
  }

  test("incremental coded upsert equals a rebuild with the same codebook, bit-for-bit") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths}
    import graft.sources.{IndexCatalog, Maintenance}
    PqIndex.ivfPqPersisted(spark, sfDir).collect()
    val name = "emb-ivfpq-bucketed"
    val cloneBase = graft.Scratch.dir("ivfpq-upsert-spec")
    Maintenance.copyTree(
      Paths.get(IndexCatalog.cacheBase(sfDir), name),
      Paths.get(cloneBase, name))
    val flat = Files.readString(
      Paths.get(cloneBase, name, "pq_codebook.txt")).split(",").map(_.toDouble)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cent = KnnSearch.withNorm(
      emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")),
      "c_embedding").withColumnRenamed("vec_norm", "c_norm")
    val twins = emb.filter(col("vec_id") < PqIndex.UpsertCount)
      .select((col("vec_id") + PqIndex.UpsertIdOffset).as("vec_id"),
        col("embedding"), col("label"))
    val batch = IvfIndex.assign(KnnSearch.withNorm(twins), cent)
      .withColumnRenamed("cent_id", "bucket")
      .drop("vec_norm")
      .withColumn("code", graft.functions.PqEncode.encode(
        graft.functions.VectorFunctions.normalize(col("embedding")),
        flat, PqIndex.M, PqIndex.K, PqIndex.SubDim))
    IndexCatalog.upsertInto(spark, cloneBase, name, batch, "vec_id")
    // rebuild over the grown corpus with the SAME stored codebook: the
    // incremental state must match on every (vec_id, bucket, code)
    val rebuilt = IvfIndex.assign(KnnSearch.withNorm(emb.unionByName(twins)), cent)
      .withColumnRenamed("cent_id", "bucket")
      .withColumn("code", graft.functions.PqEncode.encode(
        graft.functions.VectorFunctions.normalize(col("embedding")),
        flat, PqIndex.M, PqIndex.K, PqIndex.SubDim))
      .select(col("vec_id"), col("bucket"), col("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Byte](2).toSeq)).toSet
    val stored = IndexCatalog.load(spark, cloneBase, name)
      .select(col("vec_id"), col("bucket").cast("long"), col("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Byte](2).toSeq)).toSet
    stored shouldBe rebuilt
  }
}
