package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** The round-5 profiling/retrieval additions: full-outer activity join,
  * ranking-window suite, histogram, BPE-ish token accounting, TF-IDF.
  * The DuckDB oracle proves engine parity; these prove the SEMANTICS are
  * the intended ones (null-extension direction, tie behavior, formula). */
class ProfilingOpsSpec extends SparkSpecBase with Matchers {

  test("full outer activity null-extends in BOTH directions and coalesces the key") {
    val rows = RelationalOps.fullOuterActivity(spark, sfDir).collect()
    rows.length should be > 0
    // customer-only rows: name present, activity null
    assert(rows.exists(r => !r.isNullAt(1) && r.isNullAt(3)))
    // key is never null (coalesced from whichever side survives)
    assert(rows.forall(!_.isNullAt(0)))
    // keys strictly ordered
    val keys = rows.map(_.getLong(0))
    keys.toSeq shouldBe keys.sorted.toSeq
  }

  test("rank functions agree on tie semantics: rnk <= rn, drnk dense, ntile balanced") {
    val rows = RelationalOps.rankOrders(spark, sfDir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (rn, rnk, drnk) = (r.getInt(3), r.getInt(4), r.getInt(5))
      assert(rnk <= rn, "rank can never exceed row_number over the same order")
      assert(drnk <= rnk, "dense_rank can never exceed rank")
      val pct = r.getDouble(7)
      pct should (be >= 0.0 and be <= 1.0)
      r.getDouble(8) should (be > 0.0 and be <= 1.0) // cume_dist
    }
    // within each priority group rn is 1..10 (or fewer rows than 10)
    rows.groupBy(_.getString(0)).values.foreach { g =>
      g.map(_.getInt(3)).sorted.toSeq shouldBe (1 to g.length).toSeq
    }
  }

  test("histogram buckets partition the orders table exactly") {
    val h = RelationalOps.histogramOrders(spark, sfDir).collect()
    val total = graft.Tables.orders(spark, sfDir).count()
    h.map(_.getLong(1)).sum shouldBe total
    // bucket bounds actually bound the min/max inside each bucket
    h.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(lo >= b * 25000.0 && hi < (b + 1) * 25000.0)
      assert(lo <= hi)
    }
  }

  test("BPE-ish token count exceeds whitespace count on punctuated text") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tokbpe").toString
    Seq((1L, "Hello, world! I've 42 cats."), (2L, "plain words only here"))
      .toDF("doc_id", "text").write.parquet(tmp + "/documents.parquet")
    val out = TextOps.tokenBpe(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(3)))).toMap
    // doc 1: " Hello" "," " world" "!" " I" "'ve" " 42" " cats" "." = 9 bpe vs 5 ws
    out(1L) shouldBe ((9, 5))
    // doc 2: alpha-only — bpe == whitespace tokens
    out(2L) shouldBe ((4, 4))
  }

  test("approx quantiles honor the sketch's rank-error contract vs exact percentiles") {
    import org.apache.spark.sql.functions._
    val approx = EventOps.approxQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ev = graft.Tables.events(spark, sfDir)
    approx.foreach { case (tpe, qs) =>
      val values = ev.filter(col("event_type") === tpe)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      val n = values.length
      Seq(0.5, 0.95, 0.99).zip(qs).foreach { case (p, est) =>
        // percentile_approx(accuracy=100) guarantees rank error <= n/100;
        // check the estimate sits within that band of the exact order stats
        val eps = math.max(1, n / 100)
        val lo = values(math.max(0, (p * n).toInt - eps - 1))
        val hi = values(math.min(n - 1, (p * n).toInt + eps))
        assert(est >= lo && est <= hi,
          s"$tpe p$p: $est outside rank-error band [$lo, $hi]")
      }
    }
  }

  test("tfidf ranks a doc-unique term above corpus-wide terms") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tfidf").toString
    Seq(
      (1L, "shared shared unique1"),
      (2L, "shared common words"),
      (3L, "shared common words")
    ).toDF("doc_id", "text").write.parquet(tmp + "/documents.parquet")
    val out = TextOps.tfidf(spark, tmp).collect()
    val doc1Top = out.filter(r => r.getLong(0) == 1L && r.getInt(1) == 1).head
    doc1Top.getString(2) shouldBe "unique1" // df=1 beats df=3 'shared' even at tf=2
    // idf of a term in every doc is ln(1) = 0 — zero score, but still ranked
    val sharedScores = out.filter(_.getString(2) == "shared").map(_.getDouble(3))
    all(sharedScores) shouldBe 0.0
  }
}
