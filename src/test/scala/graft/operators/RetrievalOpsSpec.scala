package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Semantics gates for the retrieval-quality operators: MMR diversity
  * re-ranking (greedy objective recomputed by an independent referee) and
  * the IVF balance monitor (counts reconciled against a fresh assignment
  * of the base table — which also proves the persisted index holds
  * exactly what its definition says).
  */
class RetrievalOpsSpec extends SparkSpecBase with Matchers {

  /** Referee cosine: same arithmetic shape as the engine kernel — double
    * accumulation over the float elements, left to right. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Spark's display rounding (BigDecimal HALF_UP on the double). */
  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mmr rerank replays an independently-computed greedy selection") {
    val out = VectorOps.mmrRerank(spark, sfDir).collect()
    out.length shouldBe 5
    out.map(_.getInt(0)).toSeq shouldBe (1 to 5)

    // independent referee: shortlist, sims, greedy — all recomputed from
    // the raw embeddings, no engine code in the loop
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qv = emb(0L)
    val shortlist = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, r6(cos(v, qv))) }
      .sortBy { case (id, rel) => (-rel, id) }
      .take(20)
    val sim = (for {
      (a, _) <- shortlist; (b, _) <- shortlist if a != b
    } yield (a, b) -> r6(cos(emb(a), emb(b)))).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    for (_ <- 1 to 5) {
      val pick = shortlist
        .filterNot { case (id, _) => selected.exists(_._1 == id) }
        .map { case (id, rel) =>
          val mmr =
            if (selected.isEmpty) VectorOps.MmrLambda * rel
            else VectorOps.MmrLambda * rel -
              VectorOps.MmrComplement * selected.map(s => sim((id, s._1))).max
          (id, rel, mmr)
        }
        .minBy { case (id, _, mmr) => (-mmr, id) }
      selected += pick
    }
    out.map(_.getLong(1)).toSeq shouldBe selected.map(_._1).toSeq
    out.map(_.getDouble(2)).toSeq shouldBe selected.map(s => r6(s._2)).toSeq
    out.map(_.getDouble(3)).toSeq shouldBe selected.map(s => r6(s._3)).toSeq
    // the diversity term is bounded by the cosine range: the pick's score
    // sits within ±(1−λ) of pure relevance λ·rel (sims live in [−1, 1])
    out.foreach { r =>
      math.abs(r.getDouble(3) - VectorOps.MmrLambda * r.getDouble(2)) should
        be <= VectorOps.MmrComplement + 1e-9
    }
  }

  test("filtered search pre-filters: exact top-k of the label subset, filter pushed to the scan") {
    val q = VectorOps.knnFiltered(spark, sfDir)
    val out = q.collect()
    out.length shouldBe 10
    all(out.map(_.getInt(1))) shouldBe 3
    // referee: exact top-10 among label-3 vectors only
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val qv = emb.find(_._1 == 0L).get._2
    val expected = emb
      .filter(e => e._3 == 3 && e._1 != 0L)
      .map { case (id, v, _) => (id, r6(cos(v, qv))) }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    out.map(r => (r.getLong(0), r.getDouble(2))).toSeq shouldBe expected.toSeq
    // pre-filter reaches the scan: the label predicate is pushed down
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(label,3"),
      s"label filter must reach the parquet scan:\n$plan")
  }

  test("batched fetch returns exactly the looped per-id fetches, via one pushed IN scan") {
    val q = VectorOps.fetchBatch(spark, sfDir)
    val out = q.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val ids = VectorOps.knn(spark, sfDir)
      .collect().map(_.getLong(0)).sorted
    out.map(_._1).toSeq shouldBe ids.toSeq
    // the loop the reference runs: one point fetch per id — same rows
    val looped = ids.map { id =>
      val r = KnnSearch.fetch(Tables.embeddings(spark, sfDir), id)
        .select(col("vec_id"), col("label"),
          org.apache.spark.sql.functions.size(col("embedding")).as("dim"),
          round(graft.functions.VectorFunctions.l2Norm(col("embedding")), 6)
            .as("norm"))
        .head()
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))
    }
    out.toSeq shouldBe looped.toSeq
    // the id set reaches the scan as a pushed filter
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(vec_id"),
      s"batched fetch must push the id set to the scan:\n$plan")
  }

  test("filtered ANN ranks only label-matching vectors inside the probed buckets") {
    val out = VectorOps.annFiltered(spark, sfDir).collect()
    out.length should be > 0
    all(out.map(_.getInt(1))) shouldBe 3
    // referee: recompute assignment, probes, filter, rank from scratch
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, sfDir))
    val cent = KnnSearch.withNorm(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")),
      "c_embedding").withColumnRenamed("vec_norm", "c_norm")
    val q = KnnSearch.withNorm(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")),
      "q_embedding").withColumnRenamed("vec_norm", "q_norm")
    val probed = IvfIndex.probes(cent, q, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    // bind the (expensive) assignment ONCE; the map referee and the
    // unfiltered reference search both reuse it
    val assignedDf = IvfIndex.assign(emb, cent).localCheckpoint(true)
    val assigned = assignedDf.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
    out.foreach { r =>
      withClue(s"vec ${r.getLong(0)}: ") {
        probed should contain(r.getLong(2)) // bucket was probed
        assigned(r.getLong(0)) shouldBe r.getLong(2) // true assignment
      }
    }
    // the unfiltered IVF search over the same probes, post-filtered to
    // label 3, must be a PREFIX-compatible subset: pre-filtering can only
    // surface MORE label-3 rows, never different ones in the overlap.
    // k = corpus size, so no magic cap can truncate probed candidates.
    val unfiltered = IvfIndex.search(
        assignedDf, cent, q, nprobe = 4, k = assigned.size)
      .collect().filter(_.getInt(1) == 3)
      .map(r => (r.getLong(0), r.getDouble(3)))
    out.map(r => (r.getLong(0), r.getDouble(3))).toSeq shouldBe
      unfiltered.take(out.length).toSeq
  }

  test("batched ANN equals the single-query IVF search run per query") {
    val out = VectorOps.annBatch(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    out.keySet shouldBe Set(0L, 7L, 13L)
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, sfDir))
    val cent = KnnSearch.withNorm(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")),
      "c_embedding").withColumnRenamed("vec_norm", "c_norm")
    val assigned = IvfIndex.assign(emb, cent)
    out.foreach { case (qid, rows) =>
      val q = KnnSearch.withNorm(
        Tables.embeddings(spark, sfDir).filter(col("vec_id") === qid)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")),
        "q_embedding").withColumnRenamed("vec_norm", "q_norm")
      val single = IvfIndex.search(assigned, cent, q, nprobe = 4, k = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      withClue(s"query $qid: ") {
        rows.sortBy(_.getInt(1))
          .map(r => (r.getLong(2), r.getInt(3), r.getLong(4), r.getDouble(5)))
          .toSeq shouldBe single.toSeq
      }
    }
  }

  test("ivf drift monitor reconciles with a fresh assignment of the base table") {
    val out = VectorOps.ivfDrift(spark, sfDir).collect()
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, sfDir))
    val cent = KnnSearch.withNorm(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_embedding")),
      "c_embedding").withColumnRenamed("vec_norm", "c_norm")
    val fresh = IvfIndex.assign(emb, cent)
      .groupBy("cent_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe fresh

    val total = fresh.values.sum.toDouble
    val k = fresh.size.toDouble
    out.foreach { r =>
      val n = r.getLong(1).toDouble
      r.getDouble(2) shouldBe r6(n / total)
      r.getDouble(3) shouldBe r6(n * k / total)
      r.getInt(4) shouldBe (if (n * k / total > VectorOps.IvfBalanceThreshold) 1 else 0)
    }
    out.map(_.getLong(1)).sum shouldBe total.toLong
    // shares partition the corpus
    out.map(_.getDouble(2)).sum shouldBe 1.0 +- 1e-4
  }
}
