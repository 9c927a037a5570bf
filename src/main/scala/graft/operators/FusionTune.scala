package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID FUSION TUNING — the tuning family applied to retrieval fusion,
  * with REAL relevance labels instead of a proxy: the corpus's planted
  * near-duplicates (exact word-3gram Jaccard ≥ 0.8 — the same truth
  * q_band_tune and the gated dedup pipeline verify against) define which
  * documents a retrieval stack SHOULD return for a given query document,
  * and the sweep measures how well each fusion configuration returns
  * them. q_hybrid / q_hybrid_indexed hard-code RRF k=60 (Cormack et
  * al.'s constant); this query is the measurement that either justifies
  * that dial on this corpus or replaces it — the
  * measurement→deployment discipline every other approximate family
  * already carries.
  *
  * For the query block (every doc appearing in a truth pair — both
  * members, so the block is symmetric), five configurations rank a
  * shared candidate pool (the union of both arms' top-[[ArmK]]):
  * pure-dense, RRF at k ∈ {10, 60, 240}, pure-lexical. The metric is
  * MRR@10 over the block: per query, 2520/rank of the best-ranked true
  * duplicate in the fused top-10 (2520 = lcm(1..10), so every
  * contribution is an exact integer-valued double and the cross-query
  * sum is order-independent — no FP parity risk), normalized once at
  * the end. `chosen` = the first config (ladder order) attaining the
  * maximum UN-normalized numerator — exact-integer argmax, the family's
  * deterministic chosen contract.
  *
  * The arms:
  *  - DENSE: exact cosine of the query doc's embedding against the
  *    corpus, per-query top-[[ArmK]] (the q_nprobe_tune scored-pass
  *    shape; a production sweep swaps in the routed probed search —
  *    measured here exactly so the fusion dial isn't confounded by ANN
  *    recall).
  *  - LEXICAL: document-as-query BM25 over word-3gram SHINGLE features
  *    (the dedup family's discriminative unit — this corpus's word
  *    vocabulary is stopword-grade throughout, df ≫ any useful cap, so
  *    word features carry no near-dup signal while grams are rare by
  *    construction), df-capped at [[MaxDf]] (the hot-gram discipline —
  *    also what bounds the postings join's fanout at scale); per-feature
  *    contributions are quantized to exact integers (floor(s·1e9), the
  *    round-7 long-sum discipline) so the per-doc sum is
  *    order-independent in both engines and the arm ranks on integers.
  *
  * Scale shape (100 TB): the truth stage is the one deliberately exact
  * pass (gram-postings intersection, df-capped — run over a document
  * sample at scale exactly as the ANN tunes sample queries); the dense
  * pass is Q×N with Q = the block size (bounded); the lexical join's
  * fanout is ≤ MaxDf docs per query term by construction; the fused
  * evaluation operates on ≤ Q·2·ArmK candidate rows. Nothing
  * corpus-sized broadcasts; every per-config evaluation is a filter +
  * window over the SAME materialized candidate frame.
  *
  * Fully oracle-replayable: Jaccard truth, cosine, BM25, quantized
  * sums, RRF arithmetic, and the exact-integer MRR all have bit-stable
  * twins (each proven by an existing green family).
  */
object FusionTune {

  /** Rank depth each arm contributes to the candidate pool. */
  val ArmK = 50
  /** Query-term document-frequency cap (the dedup hot-gram discipline). */
  val MaxDf = 32
  /** lcm(1..10): 2520/rank is an exact integer for every top-10 rank. */
  val MrrScale = 2520
  /** The ladder: (order, name, rrf-k); pure arms carry no k. */
  val Configs: Seq[(Int, String, Option[Int])] = Seq(
    (0, "dense", None),
    (1, "rrf10", Some(10)),
    (2, "rrf60", Some(60)),
    (3, "rrf240", Some(240)),
    (4, "lex", None))

  /** Q-fusion-tune: one row per fusion config —
    * (ord, config, n_q, n_hit, mrr, chosen). */
  def fusionTune(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // relevance truth: the planted near-dups, both directions
    val truth = Dedup.ngramJaccardPairs(docs, 0.8, maxDf = MaxDf)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(eager = true)
    val rel = truth.select(col("doc_a").as("q_id"), col("doc_b").as("rel_id"))
      .unionByName(truth.select(col("doc_b").as("q_id"), col("doc_a").as("rel_id")))
      .localCheckpoint(eager = true)
    val qids = rel.select(col("q_id")).distinct()

    // DENSE arm: exact cosine, per-query top-ArmK
    val embN = KnnSearch.withNorm(Tables.embeddings(spark, dir))
    val qemb = embN
      .join(broadcast(qids.withColumnRenamed("q_id", "vec_id")), "vec_id")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
        col("vec_norm").as("q_norm"))
    val dw = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val dense = embN.crossJoin(broadcast(qemb))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", KnnSearch.prenormedScore)
      .withColumn("drank", row_number().over(dw))
      .filter(col("drank") <= ArmK)
      .select(col("q_id"), col("vec_id").as("doc_id"), col("drank"))

    // LEXICAL arm: doc-as-query BM25 over df-capped 3-GRAM SHINGLES —
    // the dedup family's discriminative unit, not words: this corpus's
    // word vocabulary is small (every word is stopword-grade, df ≫ the
    // cap), so word-level features carry no near-dup signal while gram
    // features are rare by construction (df ≤ 25 here). Exact-integer
    // per-doc sums (the q_bm25 arithmetic, quantized).
    val toks = docs.select(col("doc_id"), Dedup.shingles3(col("text")).as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val qids2 = qids.withColumnRenamed("q_id", "doc_id")
    // restrict the df-capped dictionary to the BLOCK's features before it
    // goes anywhere near a broadcast: dfq alone is vocabulary-sized at
    // scale (every rare gram), while the block's slice is bounded by the
    // block's gram count — the q_fusion_serve dictQ discipline
    val dfq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxDf)
      .join(broadcast(tf.join(broadcast(qids2), "doc_id")
        .select(col("w")).distinct()), Seq("w"))
    val post = tf.join(broadcast(dfq), "w")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .select(col("w"), col("doc_id"), floor(col("s") * 1e9).as("si"))
    val qt = tf.join(broadcast(qids.withColumnRenamed("q_id", "doc_id")), "doc_id")
      .select(col("doc_id").as("q_id"), col("w"))
    val lw = Window.partitionBy(col("q_id"))
      .orderBy(col("ls").desc, col("doc_id"))
    val lex = qt.join(post, "w")
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id")).agg(sum(col("si")).as("ls"))
      .withColumn("lrank", row_number().over(lw))
      .filter(col("lrank") <= ArmK)
      .select(col("q_id"), col("doc_id"), col("lrank"))

    // the shared candidate pool every config re-ranks
    val cand = dense.join(lex, Seq("q_id", "doc_id"), "full_outer")
      .localCheckpoint(eager = true)
    val nq = qids.agg(count(lit(1)).as("n_q"))

    val fw = Window.partitionBy(col("q_id"))
      .orderBy(col("f").desc, col("doc_id"))
    val sweep = Configs.map { case (ord, name, kOpt) =>
      val pool = name match {
        case "dense" => cand.filter(col("drank").isNotNull)
          .withColumn("f", -col("drank").cast("double"))
        case "lex" => cand.filter(col("lrank").isNotNull)
          .withColumn("f", -col("lrank").cast("double"))
        case _ =>
          val k = kOpt.get
          cand.withColumn("f",
            coalesce(lit(1.0) / (lit(k) + col("drank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(k) + col("lrank")), lit(0.0)))
      }
      pool
        .withColumn("rank", row_number().over(fw))
        .filter(col("rank") <= 10)
        .join(rel.withColumnRenamed("rel_id", "doc_id"), Seq("q_id", "doc_id"))
        .groupBy(col("q_id")).agg(min(col("rank")).as("br"))
        .agg(count(lit(1)).as("n_hit"),
          coalesce(sum(lit(MrrScale.toDouble) / col("br")), lit(0.0)).as("num"))
        .crossJoin(nq)
        .select(lit(ord).as("ord"), lit(name).as("config"), col("n_q"),
          col("n_hit"), col("num"))
    }.reduce(_ unionByName _)
    sweep
      .withColumn("mx", max(col("num")).over(Window.partitionBy()))
      .withColumn("chosen",
        col("ord") === min(when(col("num") === col("mx"), col("ord")))
          .over(Window.partitionBy()))
      .select(col("ord"), col("config"), col("n_q"), col("n_hit"),
        round(col("num") / (lit(MrrScale.toDouble) * col("n_q")), 6).as("mrr"),
        col("chosen"))
      .orderBy(col("ord"))
  }

  /** The oracle replays everything: the Jaccard truth (the dedupNgram
    * CTE chain), both arms, the quantized lexical sums, the five fused
    * rankings, and the exact-integer MRR argmax. Reused CTEs are
    * MATERIALIZED (the round-12 inliner discipline — `cand` is
    * referenced by five config blocks). */
  val fusionTuneSql: String = {
    import VectorSql.{cosine => cos}
    val cfgBlocks = Configs.map { case (ord, name, kOpt) =>
      val (from, fused) = name match {
        case "dense" => ("cand c WHERE c.drank IS NOT NULL",
          "0.0 - c.drank")
        case "lex" => ("cand c WHERE c.lrank IS NOT NULL",
          "0.0 - c.lrank")
        case _ =>
          val k = kOpt.get
          ("cand c",
            s"COALESCE(CAST(1.0 AS DOUBLE) / ($k + c.drank), 0.0) + " +
              s"COALESCE(CAST(1.0 AS DOUBLE) / ($k + c.lrank), 0.0)")
      }
      s"""SELECT $ord AS ord, '$name' AS config, COUNT(*) AS n_hit,
         |  COALESCE(SUM(2520.0 / br), 0.0) AS num FROM (
         |  SELECT r.q_id, MIN(r.rank) AS br FROM (
         |    SELECT c.q_id, c.doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY c.q_id
         |                         ORDER BY ($fused) DESC, c.doc_id) AS rank
         |    FROM $from) r
         |  JOIN rel ON rel.q_id = r.q_id AND rel.rel_id = r.doc_id
         |  WHERE r.rank <= 10 GROUP BY r.q_id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${DedupOps.shinglesCte},
       |ex0 AS MATERIALIZED (SELECT doc_id, unnest(grams) AS gram FROM sh),
       |dropped AS (SELECT gram FROM ex0 GROUP BY gram HAVING COUNT(*) > $MaxDf),
       |ex AS (SELECT doc_id, gram FROM ex0 ANTI JOIN dropped USING (gram)),
       |ncnt AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |truth AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN ncnt na ON doc_a = na.doc_id
       |  JOIN ncnt nb ON doc_b = nb.doc_id
       |  WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8),
       |rel AS MATERIALIZED (
       |  SELECT doc_a AS q_id, doc_b AS rel_id FROM truth
       |  UNION ALL SELECT doc_b AS q_id, doc_a AS rel_id FROM truth),
       |qids AS MATERIALIZED (SELECT DISTINCT q_id FROM rel),
       |q AS (SELECT e.vec_id AS q_id, e.embedding AS qe
       |      FROM embeddings e JOIN qids ON e.vec_id = qids.q_id),
       |dense AS MATERIALIZED (
       |  SELECT q_id, doc_id, drank FROM (
       |    SELECT q.q_id, e.vec_id AS doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |                         ORDER BY ${cos("e.embedding", "q.qe")} DESC, e.vec_id) AS drank
       |    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id)
       |  WHERE drank <= $ArmK),
       |lens AS (SELECT doc_id, len(grams) AS dl FROM sh),
       |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, gram AS w, COUNT(*) AS tf FROM ex0 GROUP BY 1, 2),
       |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w
       |        HAVING COUNT(*) <= $MaxDf),
       |post AS (SELECT tf.doc_id, tf.w,
       |    CAST(FLOOR((ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / stats.avgdl))) * 1000000000.0) AS BIGINT) AS si
       |  FROM tf JOIN dfq USING (w) JOIN lens USING (doc_id) CROSS JOIN stats),
       |qt AS (SELECT tf.doc_id AS q_id, tf.w FROM tf
       |       JOIN qids ON tf.doc_id = qids.q_id),
       |ls AS (SELECT qt.q_id, post.doc_id, SUM(post.si) AS ls
       |       FROM qt JOIN post USING (w) WHERE post.doc_id <> qt.q_id
       |       GROUP BY 1, 2),
       |lex AS MATERIALIZED (
       |  SELECT q_id, doc_id, lrank FROM (
       |    SELECT q_id, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY q_id
       |                         ORDER BY ls DESC, doc_id) AS lrank FROM ls)
       |  WHERE lrank <= $ArmK),
       |cand AS MATERIALIZED (
       |  SELECT COALESCE(d.q_id, l.q_id) AS q_id,
       |    COALESCE(d.doc_id, l.doc_id) AS doc_id, d.drank, l.lrank
       |  FROM dense d FULL OUTER JOIN lex l
       |    ON d.q_id = l.q_id AND d.doc_id = l.doc_id),
       |nq AS (SELECT COUNT(*) AS n_q FROM qids),
       |sweep AS (
       |$cfgBlocks
       |),
       |sweep2 AS (SELECT *, MAX(num) OVER () AS mx FROM sweep)
       |SELECT ord, config, (SELECT n_q FROM nq) AS n_q, n_hit,
       |  ROUND(num / (2520.0 * (SELECT n_q FROM nq)), 6) AS mrr,
       |  ord = MIN(CASE WHEN num = mx THEN ord END) OVER () AS chosen
       |FROM sweep2 ORDER BY ord""".stripMargin
  }

  /** Deterministic serve block (the ANN-tune sampling discipline applied
    * to doc ids). */
  val ServeSampleMod = 37
  val ServeSampleRes = 5

  /** The gram-postings index the chosen config serves from. */
  val GramIndexName = "docs-gram-inverted"

  def ensureGramIndex(spark: SparkSession, dir: String): graft.sources.InvertedIndex.Layout =
    graft.sources.InvertedIndex.ensureWith(spark, dir, GramIndexName, "gram3")

  /** Q-fusion-serve: the DEPLOYMENT of what q_fusion_tune measured — the
    * chosen config (pure lexical gram-BM25; the tune showed fusing in
    * the no-signal dense arm only dilutes) served for a query block from
    * a PERSISTED gram-postings index. This is near-dup retrieval as a
    * service ("find my duplicates for these docs"): the word index
    * answers keyword queries (q_bm25_indexed), the gram index answers
    * similarity queries, both through ONE build/merge pipeline
    * ([[graft.sources.InvertedIndex.ensureWith]] — same layout, same
    * maintenance story).
    *
    * Serving shape: the block's gram features and their df-capped
    * dictionary rows are collected/broadcast metadata (block-bounded);
    * the posting scan is partition-pruned to the block grams' tbuckets
    * and feature-joined against the broadcast — cost ∝ the block's rare
    * grams' posting lists (each ≤ [[MaxDf]] docs BY THE CAP), corpus-
    * size-independent. At a production vocabulary the bucket fanout
    * grows with the term space so a small block's tbucket filter stays
    * selective (the TermBuckets sizing note). Scoring is the tune's
    * exact-integer arm (floor(s·1e9) long sums), so ranks — and the
    * rounded output score — replay bit-for-bit in DuckDB. */
  def fusionServe(spark: SparkSession, dir: String): DataFrame =
    fusionServeOver(spark, dir, ensureGramIndex(spark, dir))

  /** The serve body against an arbitrary gram-index layout — shared by
    * the steady-state query and the lifecycle query ([[gramUpsert]]), so
    * both serve through literally the same plan (the bm25Over
    * discipline). */
  private def fusionServeOver(spark: SparkSession, dir: String,
                              layout: graft.sources.InvertedIndex.Layout): DataFrame = {
    import spark.implicits._
    val qt = Tables.documents(spark, dir)
      .filter(col("doc_id") % ServeSampleMod === ServeSampleRes)
      .select(col("doc_id").as("q_id"),
        explode(Dedup.shingles3(col("text"))).as("w"))
      .localCheckpoint(eager = true) // block features: bounded metadata
    val buckets = qt
      .select(graft.sources.InvertedIndex.bucketCol(col("w")).as("b"))
      .distinct().as[Long].collect().toIndexedSeq
    val post = spark.read.parquet(layout.dataPath)
      .filter(col("tbucket").isin(buckets: _*))
    // the block grams' dictionary rows under the tune's hot-gram cap —
    // tiny by construction (≤ block grams), broadcast into the scan; the
    // dict read partition-prunes to the block grams' tbuckets exactly as
    // the posting read does (the bucketed-dict layout pays off on BOTH
    // maintenance writes and serving reads)
    val dictQ = spark.read.parquet(layout.dictPath)
      .filter(col("tbucket").isin(buckets: _*) && col("df") <= MaxDf)
      .select(col("w"), col("df"))
      .join(broadcast(qt.select(col("w")).distinct()), Seq("w"))
    val stats = spark.read.parquet(layout.statsPath)
      .select(col("n"),
        (col("total_dl").cast("double") / col("n").cast("double")).as("avgdl"))
    val rw = Window.partitionBy(col("q_id"))
      .orderBy(col("ls").desc, col("doc_id"))
    post.join(broadcast(dictQ), Seq("w"))
      .join(broadcast(qt), Seq("w"))
      .filter(col("doc_id") =!= col("q_id"))
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .withColumn("si", floor(col("s") * 1e9))
      .groupBy(col("q_id"), col("doc_id")).agg(sum(col("si")).as("ls"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("doc_id"), col("rank"),
        round(col("ls").cast("double") / 1e9, 6).as("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The oracle re-derives the gram index from raw text and replays the
    * serve: same features, same cap, same quantized sums, same ranking. */
  val fusionServeSql: String =
    s"""WITH ${DedupOps.shinglesCte},
       |ex0 AS MATERIALIZED (SELECT doc_id, unnest(grams) AS w FROM sh),
       |lens AS (SELECT doc_id, len(grams) AS dl FROM sh),
       |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM ex0 GROUP BY 1, 2),
       |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w
       |        HAVING COUNT(*) <= $MaxDf),
       |qt AS (SELECT doc_id AS q_id, w FROM ex0
       |       WHERE doc_id % $ServeSampleMod = $ServeSampleRes),
       |contrib AS (SELECT qt.q_id, tf.doc_id,
       |    CAST(FLOOR((ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / stats.avgdl))) * 1000000000.0) AS BIGINT) AS si
       |  FROM qt JOIN tf USING (w) JOIN dfq USING (w)
       |  JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN stats
       |  WHERE tf.doc_id <> qt.q_id),
       |ls AS (SELECT q_id, doc_id, SUM(si) AS ls FROM contrib GROUP BY 1, 2),
       |ranked AS (SELECT q_id, doc_id, ls,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY ls DESC, doc_id) AS rank FROM ls)
       |SELECT q_id, doc_id, rank,
       |  ROUND(CAST(ls AS DOUBLE) / 1000000000.0, 6) AS score
       |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Q-gram-upsert: the gram index's LIFECYCLE as a declared query —
    * clone the shared cached index, grow it through the tokenizer-
    * matched [[graft.sources.InvertedIndex.upsertDocs]] (posting append
    * ∝ the batch's term buckets, term-level dict merge, exact-integer
    * stats, lens append), and serve the block through literally the
    * same plan as q_fusion_serve. The oracle rebuilds from scratch over
    * the grown corpus: n, avgdl, and every shared gram's df shift with
    * the twins, so a stale or tokenizer-mismatched merge fails the hash
    * — incremental == rebuild, now first-class for the similarity index
    * exactly as q_bm25_upsert made it for the keyword index. */
  def gramUpsert(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Paths
    import graft.sources.{IndexCatalog, InvertedIndex, Maintenance}
    ensureGramIndex(spark, dir)
    val cloneRoot = Paths.get(graft.Scratch.dir("gram-upsert"))
    Maintenance.copyTree(
      Paths.get(IndexCatalog.cacheBase(dir), GramIndexName), cloneRoot)
    val layout = InvertedIndex.Layout(
      cloneRoot.resolve("data").toString,
      cloneRoot.resolve("dict").toString,
      cloneRoot.resolve("stats").toString)
    val twins = Tables.documents(spark, dir)
      .filter(col("doc_id") < InvertedIndex.UpsertSrcCount)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("text"))
    // the tokenizer dispatches from the cloned index's own marker
    // ("gram3") — a mismatched maintenance attach is structurally
    // impossible now, not merely avoided by a careful caller
    InvertedIndex.upsertDocs(spark, layout, twins)
    fusionServeOver(spark, dir, layout)
  }

  /** Incremental == rebuild over the grown corpus (the bm25UpsertSql
    * replace discipline applied to the gram pipeline's base CTE). */
  val gramUpsertSql: String = fusionServeSql
    .replace("WITH toks AS",
      s"WITH d2 AS (SELECT doc_id, text FROM documents UNION ALL " +
        s"SELECT doc_id + ${graft.sources.InvertedIndex.UpsertIdOffset} AS doc_id, text " +
        s"FROM documents WHERE doc_id < ${graft.sources.InvertedIndex.UpsertSrcCount}),\ntoks AS")
    .replace("FROM documents)", "FROM d2)")
    // the QUERY block stays the original corpus's (the Spark side samples
    // Tables.documents) — without this pin, twin id offset+4 ≡ 5 (mod 37)
    // would enter the oracle's block but not the engine's
    .replace(s"WHERE doc_id % $ServeSampleMod = $ServeSampleRes)",
      s"WHERE doc_id % $ServeSampleMod = $ServeSampleRes " +
        s"AND doc_id < ${graft.sources.InvertedIndex.UpsertIdOffset})")

  /** Q-stream-gram-upsert: STREAMING MAINTENANCE for the gram index —
    * the [[gramUpsert]] corpus growth delivered as two micro-batches
    * through the SAME [[graft.sources.InvertedIndex.maintainIndex]] sink
    * that maintains the word index (q_stream_bm25_upsert): the sink
    * dispatches the tokenizer from the target index's marker, so one
    * foreachBatch pipeline keeps BOTH retrieval indexes fresh with the
    * right features each. Same oracle as q_gram_upsert: multi-trigger
    * streaming maintenance, one-shot batch maintenance, and a
    * from-scratch rebuild over the grown corpus agree bit-for-bit. */
  def streamGramUpsert(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Paths
    import graft.sources.{IndexCatalog, InvertedIndex, Maintenance}
    ensureGramIndex(spark, dir)
    val cloneRoot = Paths.get(graft.Scratch.dir("gram-stream-upsert"))
    Maintenance.copyTree(
      Paths.get(IndexCatalog.cacheBase(dir), GramIndexName), cloneRoot)
    val layout = InvertedIndex.Layout(
      cloneRoot.resolve("data").toString,
      cloneRoot.resolve("dict").toString,
      cloneRoot.resolve("stats").toString)
    val twins = Tables.documents(spark, dir)
      .filter(col("doc_id") < InvertedIndex.UpsertSrcCount)
      .select((col("doc_id") + InvertedIndex.UpsertIdOffset).as("doc_id"),
        col("text"))
    val staged = graft.Scratch.dir("gram-stream-in")
    val half = InvertedIndex.UpsertIdOffset + InvertedIndex.UpsertSrcCount / 2
    twins.filter(col("doc_id") < half)
      .coalesce(1).write.mode("overwrite").parquet(staged)
    graft.streaming.DocStream.stampAscendingMtimes(staged)
    twins.filter(col("doc_id") >= half)
      .coalesce(1).write.mode("append").parquet(staged)
    val stream = spark.readStream.schema(twins.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = InvertedIndex.maintainIndex(stream, layout).start()
    try {
      q.processAllAvailable()
      graft.streaming.TriggerStats.record("q_stream_gram_upsert", q)
    } finally q.stop()
    fusionServeOver(spark, dir, layout)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fusion_tune" -> (fusionTune _),
    "q_fusion_serve" -> (fusionServe _),
    "q_gram_upsert" -> (gramUpsert _),
    "q_stream_gram_upsert" -> (streamGramUpsert _))

  def oracles: Map[String, String] = Map(
    "q_fusion_tune" -> fusionTuneSql,
    "q_fusion_serve" -> fusionServeSql,
    "q_gram_upsert" -> gramUpsertSql,
    // the one-maintenance-sink-for-both-indexes claim, oracle-gated:
    // streamed gram maintenance lands on the identical rebuilt state
    "q_stream_gram_upsert" -> gramUpsertSql)
}
