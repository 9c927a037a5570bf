package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** Hand-computed semantics for the round-5 pipeline additions: containment
  * dedup, the ordered funnel, and cohort retention. */
class PipelineOpsSpec extends SparkSpecBase with Matchers {

  test("containment finds a doc embedded in a larger one that Jaccard misses") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("contain").toString
    val small = "alpha beta gamma delta epsilon zeta"            // 4 shingles
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ") // superset
    Seq((1L, small), (2L, big), (3L, "totally different words here now"))
      .toDF("doc_id", "text").write.parquet(tmp + "/documents.parquet")
    val docs = graft.Tables.documents(spark, tmp)
    val cont = Dedup.containmentPairs(docs, 0.9).collect()
    // doc 1 fully inside doc 2 → containment 1.0 in the 1→2 direction only
    cont.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) should contain((1L, 2L, 1.0))
    assert(!cont.exists(r => r.getLong(0) == 2L && r.getLong(1) == 1L))
    // symmetric Jaccard misses the same pair at the same bar
    val jac = Dedup.ngramJaccardPairs(docs, 0.9).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("funnel counts strictly-ordered stage arrivals, not mere existence") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("funnel").toString
    def t(s: Int) = java.time.Instant.parse(f"2024-01-01T00:00:$s%02dZ")
    // user 1: signup(1) view(2) purchase(3)  — full funnel
    // user 2: view(1) signup(2) purchase(3)  — view BEFORE signup: stops at stage 1...
    //         (purchase needs a view after signup; there is none)
    // user 3: signup(1) view(2)              — no purchase
    // user 4: purchase(1)                    — never signed up
    val rows = Seq(
      (1L, t(1), 1L, "signup"), (2L, t(2), 1L, "view"), (3L, t(3), 1L, "purchase"),
      (4L, t(1), 2L, "view"), (5L, t(2), 2L, "signup"), (6L, t(3), 2L, "purchase"),
      (7L, t(1), 3L, "signup"), (8L, t(2), 3L, "view"),
      (9L, t(1), 4L, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.parquet(tmp + "/events_plain.parquet")
    // the declared query binds to Tables.events (NANOS parquet layout);
    // drive the production core directly over the plain frame
    val ev = spark.read.parquet(tmp + "/events_plain.parquet")
    val out = EventOps.funnelStages(ev, Seq("signup", "view", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out("1_signup") shouldBe 3L   // users 1, 2, 3
    out("2_view") shouldBe 2L     // users 1, 3 (user 2's view precedes signup)
    out("3_purchase") shouldBe 1L // user 1 only
  }

  test("entropy: uniform text maxes, single-char text zeroes, formula exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("entropy").toString
    Seq((1L, "aaaa"), (2L, "abcd"), (3L, "aabb"))
      .toDF("doc_id", "text").write.parquet(tmp + "/documents.parquet")
    val out = TextOps.entropy(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    out(1L) shouldBe 0.0 // single distinct char
    out(2L) shouldBe math.log(4.0) +- 1e-6 // uniform over 4 chars
    out(3L) shouldBe math.log(2.0) +- 1e-6 // uniform over 2 chars
  }

  test("anomaly: z-scores are standard — mean 0, |z|>3 only for true tails") {
    val rows = EventOps.anomaly(spark, sfDir).collect()
    // every reported row genuinely exceeds the bar
    rows.foreach(r => math.abs(r.getDouble(3)) should be > 3.0)
    // and the set is a small tail of the corpus (sanity against a
    // formula bug marking everything anomalous)
    val total = graft.Tables.events(spark, sfDir).count()
    rows.length.toDouble / total should be < 0.05
  }

  test("winnow overlap finds a shared paragraph inside otherwise-different docs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("winover").toString
    val stolen = "the quick brown fox jumps over the lazy dog again and again today"
    val docA = stolen + " plus completely original content about databases and queries"
    val docB = "unrelated preamble text discussing weather patterns " + stolen
    val docC = "nothing in common here at all just noise tokens everywhere always"
    Seq((1L, docA), (2L, docB), (3L, docC))
      .toDF("doc_id", "text").write.parquet(tmp + "/documents.parquet")
    val pairs = TextOps.winnowOverlap(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L)) // the stolen run leaves >= 5 shared fingerprints
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "doc 3 shares nothing")
    // and whole-doc Jaccard misses the same pair at a high bar: the shared
    // run is a minority of each doc's shingles
    val jac = graft.operators.Dedup
      .ngramJaccardPairs(graft.Tables.documents(spark, tmp), 0.9).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("transition matrix rows are proper distributions and counts are exact") {
    val rows = EventOps.transitions(spark, sfDir).collect()
    rows.length should be > 0
    // per prev_type, probabilities sum to ~1 and counts are positive
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val ps = g.map(_.getDouble(3))
      ps.sum shouldBe 1.0 +- 1e-4 // round-6 per cell
      all(g.map(_.getLong(2))) should be > 0L
    }
    // total transitions = total events - one per user (first event has no prev)
    val ev = graft.Tables.events(spark, sfDir)
    val users = ev.select("user_id").distinct().count()
    rows.map(_.getLong(2)).sum shouldBe ev.count() - users
  }

  test("pipeline e2e equals the stage-by-stage composition and fuses to two shuffles") {
    import org.apache.spark.sql.functions._
    val dir = sfDir
    // independent derivation: run each stage as its own materialized step
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val survivorIds = Dedup.exact(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val gateKeep = CorpusOps.gopherFlags(docs).filter(col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val en = docs.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = survivorIds & gateKeep & en
    val staged = PipelineOps.chunkSpans(
        docs.filter(col("doc_id").isInCollection(kept)).drop("lang"))
      .groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"), sum(col("chunk_len")).as("n_tokens"))
      .orderBy("source").collect().map(_.toString)
    val fused = PipelineOps.pipelineE2e(spark, dir)
    fused.collect().map(_.toString) shouldBe staged
    // the composed plan pays exactly 4 exchanges — fingerprint partition,
    // the distinct-agg's two phases, the presentation sort — independent
    // of stage count (gate, routing, chunking all fuse map-side). Under
    // AQE the plan string prints final THEN initial; count only the
    // final section (AQE may re-plan, so the two sections can differ)
    val planStr = fused.queryExecution.executedPlan.toString
    val finalSection = planStr.split("== Initial Plan ==").head
    finalSection.linesIterator.count(_.contains("Exchange")) should be <= 4
    // and dedup candidates prune BEFORE the shuffle (partial group limit)
    finalSection should include("WindowGroupLimit")
  }

  test("sharding preserves the chunk stream; assignment is a pure function of identity") {
    val shards = PipelineOps.shardChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // accounting preserves the chunk stream exactly
    shards.map(_._3).sum shouldBe PipelineOps.chunkOverlap(spark, sfDir).count()
    all(shards.map(_._1)) should (be >= 0L and be < PipelineOps.NShards)
    // determinism: a second evaluation of the same data is bit-identical
    // (hash membership, not RNG) — the property sample()-based sharding lacks
    val again = PipelineOps.shardChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    again shouldBe shards
  }

  test("psi drift: identical windows read exactly stable, a planted shift crosses 0.25") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("psi").toString
    def nanos(day: Int) = java.time.LocalDate.of(2024, 1, day)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000000L
    // 'stable': the same uniform 10-bin spread in both windows → every
    // p_cur == p_ref → PSI is exactly 0 (not just small)
    val stable = (1 to 200).map(i =>
      (i.toLong, nanos(5), 1L, "stable", (i % 10) * 50.0 + 1, "{}")) ++
      (1 to 200).map(i =>
        (200L + i, nanos(20), 1L, "stable", (i % 10) * 50.0 + 1, "{}"))
    // 'shifted': all mass moves from bin 0 to bin 9 across the split
    val shifted = (1 to 200).map(i =>
      (400L + i, nanos(5), 1L, "shifted", 1.0, "{}")) ++
      (1 to 200).map(i =>
        (600L + i, nanos(20), 1L, "shifted", 451.0, "{}"))
    // 'born': the type has NO reference window at all — it first appears
    // after the split, the exact drift the monitor exists for; t_ref = 0
    // must take the ε floor, not divide (ANSI would throw)
    val born = (1 to 50).map(i =>
      (800L + i, nanos(20), 1L, "born", 100.0, "{}"))
    (stable ++ shifted ++ born)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(tmp + "/events.parquet")
    val out = EventOps.psiDrift(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    out("stable") shouldBe 0.0
    out("shifted") should be > 0.25
    out("born") should be > 0.25
  }

  test("retention matrix: day-0 cell equals cohort size, offsets bounded") {
    val out = EventOps.retention(spark, sfDir).collect()
    out.length should be > 0
    val byCohort = out.groupBy(_.getString(0))
    byCohort.foreach { case (_, cells) =>
      val offsets = cells.map(_.getInt(1))
      all(offsets) should (be >= 0 and be <= 7)
      // day-0 users is the max cell of its cohort (every user appears on their first day)
      val d0 = cells.find(_.getInt(1) == 0).map(_.getLong(2)).getOrElse(0L)
      cells.map(_.getLong(2)).max shouldBe d0
    }
  }
}
