package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class KnnAndUpsertSpec extends SparkSpecBase with Matchers {

  lazy val emb = Tables.embeddings(spark, sfDir)
  lazy val index = KnnSearch.withNorm(emb)
  lazy val q = emb.filter(col("vec_id") === 0)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))

  test("top-K is a prefix of top-(K+1)") {
    val k5 = KnnSearch.topK(index, q, 5).select("vec_id").collect().map(_.getLong(0))
    val k6 = KnnSearch.topK(index, q, 6).select("vec_id").collect().map(_.getLong(0))
    k6.take(5) shouldBe k5
  }

  test("kNN never returns the query vector itself and scores are sorted desc") {
    val rows = KnnSearch.topK(index, q, 10).collect()
    rows.map(_.getLong(0)) should not contain 0L
    val scores = rows.map(_.getDouble(2))
    scores.sorted.reverse shouldBe scores
  }

  test("batch kNN join returns exactly k neighbors per query with rank 1..k") {
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val res = KnnSearch.knnJoin(index, qs, 3).collect()
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.length shouldBe 3
      rows.map(_.getInt(4)).sorted shouldBe Array(1, 2, 3)
    }
  }

  test("euclidean metric ranks ascending, dotproduct descending, unknown metric raises") {
    val l2 = KnnSearch.topK(index, q, 10, metric = "euclidean").collect()
    l2.map(_.getLong(0)) should not contain 0L
    val dists = l2.map(_.getDouble(2))
    dists.sorted shouldBe dists // nearest (smallest distance) first
    val dot = KnnSearch.topK(index, q, 10, metric = "dotproduct").collect()
    val sims = dot.map(_.getDouble(2))
    sims.sorted.reverse shouldBe sims
    an[IllegalArgumentException] should be thrownBy
      KnnSearch.topK(index, q, 10, metric = "manhattan")
  }

  test("euclidean kNN equals brute-force distance ranking computed independently") {
    val qv = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val brute = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val d = math.sqrt(v.indices.map(i => {
          val diff = v(i).toDouble - qv(i).toDouble; diff * diff
        }).sum)
        (r.getLong(0), BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    val engine = KnnSearch.topK(index, q, 10, metric = "euclidean")
      .select("vec_id").collect().map(_.getLong(0))
    engine shouldBe brute
  }

  test("int8 scalar quantization preserves cosine ranking to small error") {
    val rows = VectorOps.sq8Knn(spark, sfDir).collect()
    rows.length shouldBe 10
    rows.foreach { r =>
      // 8-bit symmetric quantization on 64-dim vectors: worst-case per-dim
      // error 0.5/127 ≈ 0.004 — cosine drift stays well under 0.05
      math.abs(r.getAs[Double]("approx_cos") - r.getAs[Double]("exact_cos")) should be < 0.05
    }
    // the quantized top set must substantially agree with the exact top-10
    val exact = KnnSearch.topK(index, q, 10).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    rows.map(_.getAs[Long]("vec_id")).count(exact.contains) should be >= 8
  }

  test("q_sq8_persisted: INT8 codes round-trip exactly and the persisted store serves q_sq8_knn's identical ranking") {
    val persisted = VectorOps.sq8Persisted(spark, sfDir).collect().map(_.toString).toSeq
    val inMemory = VectorOps.sq8Knn(spark, sfDir).collect().map(_.toString).toSeq
    persisted shouldBe inMemory
    // the stored artifact really is the 1-byte-per-dim page: tinyint
    // element type, and every code within the symmetric int8 range
    val store = spark.read.parquet(VectorOps.ensureSq8(spark, sfDir))
    store.schema("qcode").dataType shouldBe
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, true)
    import org.apache.spark.sql.functions.{array_max, array_min, col, greatest, abs => sabs}
    store.select(greatest(sabs(array_max(col("qcode"))), sabs(array_min(col("qcode")))).as("m"))
      .agg(org.apache.spark.sql.functions.max(col("m"))).head().getByte(0).toInt should be <= 127
  }

  test("fetch returns exactly the requested id (point lookup)") {
    val r = KnnSearch.fetch(emb, 42L).collect()
    r.length shouldBe 1
    r.head.getLong(0) shouldBe 42L
  }

  test("IVF search results are a subset of brute-force kNN over probed buckets, exact-ranked") {
    val cent = KnnSearch.withNorm(emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")), "c_embedding")
      .withColumnRenamed("vec_norm", "c_norm")
    val qn = KnnSearch.withNorm(emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")), "q_embedding")
      .withColumnRenamed("vec_norm", "q_norm")
    val assigned = IvfIndex.assign(index, cent)
    // every vector is assigned to exactly one bucket
    assigned.count() shouldBe emb.count()
    val ivf = IvfIndex.search(assigned, cent, qn, nprobe = 16, k = 10)
      .select("vec_id").collect().map(_.getLong(0))
    // probing ALL 16 buckets makes IVF exhaustive → must equal brute force
    val brute = KnnSearch.topK(index, q, 10).select("vec_id").collect().map(_.getLong(0))
    ivf shouldBe brute
  }

  test("large-block kNN join never broadcasts the query side and matches per-bucket brute force") {
    val joined = KnnSearch.knnJoinLarge(emb, dim = 64, k = 3)
    val rows = joined.collect()
    rows.length should be > 0
    // the 100 TB property: the table-sized query block is NOT broadcast —
    // the join is a shuffle join on the bucket key
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastExchange"
    plan should include("SortMergeJoin")
    // ranks are 1..k per query, scores non-increasing within a query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.map(_.getInt(4)).sorted shouldBe (1 to rs.length)
      val byRank = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      byRank.zip(byRank.tail).foreach { case (a, b) => a should be >= b }
    }
    // spot-check one query against per-bucket brute force
    val bucketed = KnnSearch.withNorm(emb)
      .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), 64))
    val q0 = bucketed.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val qb = RandomHyperplaneLsh.bucketOf(q0.head().getSeq[Float](1).toArray)
    val brute = KnnSearch.topK(bucketed.filter(col("bucket") === qb), q0, 3)
      .select("vec_id").collect().map(_.getLong(0))
    rows.filter(_.getLong(0) == 0L).sortBy(_.getInt(4)).map(_.getLong(1)) shouldBe brute
  }

  test("upsert is last-write-wins by version and idempotent on re-upsert") {
    val b0 = emb.select(col("vec_id"), col("label"), lit(0).as("batch"))
    val b1 = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), (col("label") + 100).as("label"), lit(1).as("batch"))
    val merged = Upsert.lastWriteWins(b0.unionByName(b1), Seq("vec_id"), "batch")
    merged.count() shouldBe emb.count()
    merged.filter(col("vec_id") % 10 === 0)
      .agg(min(col("label"))).head().getInt(0) should be >= 100
    // re-upserting the SAME batch twice changes nothing (ref's line-number
    // ids make re-runs silently idempotent — upsert/upsert.go:170)
    val again = Upsert.lastWriteWins(
      merged.unionByName(merged), Seq("vec_id"), "batch")
    again.count() shouldBe merged.count()
  }
}
