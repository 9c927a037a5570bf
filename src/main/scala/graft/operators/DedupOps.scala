package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries + DuckDB oracles for the [[Dedup]] suite. The corpus
  * has planted near-duplicates (~24 pairs at sf0.01, true 3-gram Jaccard
  * ≈ 0.98), so every query returns discriminating, nonzero results.
  */
object DedupOps {

  /** Shared oracle CTE: distinct word-3gram shingles per doc (also the
    * relevance-truth base of [[FusionTune]]'s oracle). */
  private[operators] val shinglesCte =
    """toks AS (SELECT doc_id, trim(text) AS tt,
      |                regexp_split_to_array(trim(text), '\s+') AS t
      |         FROM documents),
      |sh AS (SELECT doc_id,
      |         CASE WHEN len(t) >= 3
      |           THEN list_distinct(list_transform(range(1, len(t)-1),
      |                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |           ELSE [tt] END AS grams
      |       FROM toks)""".stripMargin

  /** Q-dedup-exact: duplicate the corpus with shifted ids, dedup by
    * normalized-text fingerprint keeping the lowest id — every original id
    * must survive, every shifted copy must drop. The shift is
    * MAX(doc_id)+1 (the q_scd2 lesson: a fixed constant collides with
    * real ids once the domain grows past it, and a colliding id makes
    * the ordered-hash gate nondeterministic). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val shift = docs.agg((max(col("doc_id")) + 1L).as("mi"))
    val corpus = docs.unionByName(
      docs.crossJoin(broadcast(shift))
        .select((col("doc_id") + col("mi")).as("doc_id"), col("text")))
    Dedup.exact(corpus)
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  val dedupExactSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
      |    text FROM documents),
      |fps AS (SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
      |        FROM corpus),
      |r AS (SELECT doc_id, fp, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |      FROM fps)
      |SELECT doc_id, fp FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Q-dedup-ngram: exact word-3gram Jaccard pairs at ≥ 0.8, document-
    * frequency-capped at df ≤ 32 (see [[Dedup.ngramJaccardPairs]] — the cap
    * bounds the self-join's per-gram fanout; non-binding on this corpus, so
    * the pair set equals the uncapped one). */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, dir), 0.8, maxDf = 32)
      .orderBy(col("doc_a"), col("doc_b"))

  val dedupNgramSql: String =
    s"""WITH $shinglesCte,
       |ex0 AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
       |dropped AS (SELECT gram FROM ex0 GROUP BY gram HAVING COUNT(*) > 32),
       |ex AS (SELECT doc_id, gram FROM ex0 ANTI JOIN dropped USING (gram)),
       |n AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
       |FROM inter
       |JOIN n na ON doc_a = na.doc_id
       |JOIN n nb ON doc_b = nb.doc_id
       |WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Q-containment: asymmetric overlap — doc_a's grams ≥ 90% covered by
    * doc_b ([[Dedup.containmentPairs]]); catches subset duplication that
    * symmetric Jaccard structurally misses. Oracle mirrors the df cap and
    * tests both directions of each intersection. */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(spark, dir), 0.9, maxDf = 32)
      .orderBy(col("doc_a"), col("doc_b"))

  val dedupContainmentSql: String =
    s"""WITH $shinglesCte,
       |ex0 AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
       |dropped AS (SELECT gram FROM ex0 GROUP BY gram HAVING COUNT(*) > 32),
       |ex AS (SELECT doc_id, gram FROM ex0 ANTI JOIN dropped USING (gram)),
       |n AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |dirs AS (
       |  SELECT doc_a, doc_b, CAST(i AS DOUBLE) / na.n AS containment
       |  FROM inter JOIN n na ON doc_a = na.doc_id
       |  UNION ALL
       |  SELECT doc_b, doc_a, CAST(i AS DOUBLE) / nb.n AS containment
       |  FROM inter JOIN n nb ON doc_b = nb.doc_id)
       |SELECT doc_a, doc_b, ROUND(containment, 6) AS containment
       |FROM dirs WHERE containment >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Q-dedup-minhash: LSH candidate pairs with signature-agreement
    * estimate ≥ 0.5. */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, dir), 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  val dedupMinhashSql: String =
    s"""WITH $shinglesCte,
       |hs AS (SELECT doc_id,
       |         list_transform(grams, g -> CAST('0x' || substr(md5(g),1,12) AS BIGINT)) AS hs
       |       FROM sh),
       |sig AS (SELECT doc_id,
       |          list_transform(range(0, ${Dedup.MinhashFns}),
       |            j -> list_min(list_transform(hs,
       |                   h -> (((1103515245*(j+1) + 12345) % ${Dedup.MinhashPrime})
       |                          * (h % ${Dedup.MinhashPrime})
       |                         + ((69069*(j+1) + 1234567) % ${Dedup.MinhashPrime}))
       |                        % ${Dedup.MinhashPrime}))) AS sig
       |        FROM hs),
       |bands AS (SELECT doc_id, sig, r.k AS band_idx,
       |            md5(CAST(sig[2*r.k+1] AS VARCHAR) || ',' ||
       |                CAST(sig[2*r.k+2] AS VARCHAR)) AS band_hash
       |          FROM sig, range(0, ${Dedup.LshBands}) r(k)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |          AND a.doc_id < b.doc_id),
       |est AS (SELECT doc_a, doc_b,
       |          CAST(list_sum(list_transform(sa.sig,
       |                 (x,i) -> CASE WHEN x = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |            / ${Dedup.MinhashFns}.0 AS est
       |        FROM cand
       |        JOIN sig sa ON doc_a = sa.doc_id
       |        JOIN sig sb ON doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, ROUND(est, 6) AS est_jaccard FROM est
       |WHERE est >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  /** Q-dedup-gated: the scale-safe composition — MinHash-LSH candidates
    * verified with exact Jaccard on candidates ONLY (no corpus-wide gram
    * self-join; plan-asserted in DedupSpec). The oracle replays the whole
    * pipeline: signatures → banding → candidates → list-intersect
    * verification. */
  def dedupGated(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearDupPairs(Tables.documents(spark, dir), 0.8, 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  val dedupGatedSql: String =
    s"""WITH $shinglesCte,
       |hs AS (SELECT doc_id, grams,
       |         list_transform(grams, g -> CAST('0x' || substr(md5(g),1,12) AS BIGINT)) AS hs
       |       FROM sh),
       |sig AS (SELECT doc_id, grams,
       |          list_transform(range(0, ${Dedup.MinhashFns}),
       |            j -> list_min(list_transform(hs,
       |                   h -> (((1103515245*(j+1) + 12345) % ${Dedup.MinhashPrime})
       |                          * (h % ${Dedup.MinhashPrime})
       |                         + ((69069*(j+1) + 1234567) % ${Dedup.MinhashPrime}))
       |                        % ${Dedup.MinhashPrime}))) AS sig
       |        FROM hs),
       |bands AS (SELECT doc_id, sig, r.k AS band_idx,
       |            md5(CAST(sig[2*r.k+1] AS VARCHAR) || ',' ||
       |                CAST(sig[2*r.k+2] AS VARCHAR)) AS band_hash
       |          FROM sig, range(0, ${Dedup.LshBands}) r(k)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |          AND a.doc_id < b.doc_id),
       |est AS (SELECT doc_a, doc_b
       |        FROM cand
       |        JOIN sig sa ON doc_a = sa.doc_id
       |        JOIN sig sb ON doc_b = sb.doc_id
       |        WHERE CAST(list_sum(list_transform(sa.sig,
       |                (x,i) -> CASE WHEN x = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |              / ${Dedup.MinhashFns}.0 >= 0.5),
       |ver AS (SELECT doc_a, doc_b,
       |          CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
       |            / (len(ga.grams) + len(gb.grams)
       |               - len(list_intersect(ga.grams, gb.grams))) AS jaccard
       |        FROM est
       |        JOIN sh ga ON doc_a = ga.doc_id
       |        JOIN sh gb ON doc_b = gb.doc_id)
       |SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM ver
       |WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin

  /** Q-dedup-clusters: the end of the dedup pipeline — gated near-dup
    * PAIRS resolved into connected components, one survivor per cluster
    * (lowest doc_id, the keep-lowest rule of q_dedup_exact). The Spark
    * side is iterative min-label propagation ([[Dedup.resolveClusters]]);
    * the oracle computes full transitive reachability with a recursive
    * CTE — an entirely different algorithm arriving at the same
    * components, which is the point of the check. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.resolveClusters(Dedup.nearDupPairs(Tables.documents(spark, dir), 0.8, 0.5))
      .select(col("doc_id"), col("rep"), (col("doc_id") === col("rep")).as("keep"))
      .orderBy(col("doc_id"))

  val dedupClustersSql: String =
    s"""WITH RECURSIVE
       |pairs AS (SELECT doc_a, doc_b FROM ($dedupGatedSql)),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |rep AS (SELECT src AS doc_id, least(src, MIN(dst)) AS rep
       |        FROM reach GROUP BY src)
       |SELECT doc_id, rep, (doc_id = rep) AS keep FROM rep
       |ORDER BY doc_id""".stripMargin

  /** Q-dedup-simhash: 32-bit simhash pairs at hamming ≤ 3. The Spark plan
    * uses pigeonhole chunk-banding (lossless); the oracle brute-forces the
    * quadratic scan — identical result sets prove the optimization. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir), 3)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))

  val dedupSimhashSql: String =
    s"""WITH $shinglesCte,
      |hw AS (SELECT doc_id,
      |    list_transform(grams, g -> CAST('0x' || substr(md5(g),1,12) AS BIGINT)) AS hw
      |  FROM sh),
      |bits AS (SELECT doc_id,
      |    list_transform(range(0, 32), i ->
      |      CASE WHEN list_sum(list_transform(hw, h ->
      |             CASE WHEN CAST(floor(h / power(2, i)) AS BIGINT) % 2 = 1
      |                  THEN 1 ELSE -1 END)) > 0
      |           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bits
      |  FROM hw),
      |sims AS (SELECT doc_id, list_reduce(bits, (s, b) -> s*2 + b) AS simhash FROM bits)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Q-dedup-embed: label-blocked embedding-cosine near-dup pairs. The 0.4
    * threshold sits just under the corpus max (~0.47) so the result is
    * small but nonempty. */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupPairs(
      KnnSearch.withNorm(Tables.embeddings(spark, dir)), 0.4)
      .orderBy(col("label"), col("vec_a"), col("vec_b"))

  val dedupEmbedSql: String = {
    val cos = VectorSql.cosine("a.embedding", "b.embedding")
    s"""WITH scored AS (
       |  SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS score
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT label, vec_a, vec_b, ROUND(score, 6) AS score FROM scored
       |WHERE score >= 0.4 ORDER BY label, vec_a, vec_b""".stripMargin
  }

  /** Q-dedup-embed-lsh: embedding near-dup with NO precomputed cluster —
    * the block key is an LSH bucket computed map-side ([[RandomHyperplaneLsh
    * .bucket]]), the realistic 100 TB shape when no label/cluster metadata
    * exists. Same per-block-quadratic pair join as q_dedup_embed; single-
    * probe recall semantics (pairs split across buckets are missed — the
    * multi-probe extension covers them, LshRecallSpec). */
  def dedupEmbedLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = KnnSearch.withNorm(Tables.embeddings(spark, dir))
      .withColumn("bucket", RandomHyperplaneLsh.bucket(col("embedding"), 64))
    Dedup.embeddingNearDupPairs(emb, 0.4, blockCol = "bucket")
      .orderBy(col("bucket"), col("vec_a"), col("vec_b"))
  }

  val dedupEmbedLshSql: String = {
    val cos = VectorSql.cosine("a.embedding", "b.embedding")
    val bucket = RandomHyperplaneLsh.bucketSqlPublic("embedding")
    s"""WITH bk AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
       |scored AS (
       |  SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS score
       |  FROM bk a JOIN bk b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT bucket, vec_a, vec_b, ROUND(score, 6) AS score FROM scored
       |WHERE score >= 0.4 ORDER BY bucket, vec_a, vec_b""".stripMargin
  }

  /** Q-dup-gram-frac: per-doc CROSS-corpus duplicated-shingle fraction —
    * the share of a doc's distinct 3-gram shingles that also appear in at
    * least one OTHER document (RefinedWeb-style duplication profiling;
    * the within-doc twin is q_repetition). Unlike the pair queries this
    * never materializes pairs: one partial-aggregated count per gram (the
    * df frame), one shuffle join postings⋈df on the 8-byte gram hash, one
    * per-doc re-aggregation. Hot stopword grams cost a COUNT, not a
    * buffer, so there is no skew bomb; AQE splits any oversized join
    * partition. Shingles are distinct per doc by construction, so df is
    * exactly the number of docs containing the gram. */
  def dupGramFrac(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.shingles3(col("text"))).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gram"))
    val dfreq = ex.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    ex.join(dfreq, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 6))
      .orderBy(col("doc_id"))
  }

  val dupGramFracSql: String =
    s"""WITH $shinglesCte,
       |ex0 AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
       |dfreq AS (SELECT gram, COUNT(*) AS df FROM ex0 GROUP BY gram)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |  CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  ROUND(CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS dup_frac
       |FROM ex0 JOIN dfreq USING (gram)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Q-source-overlap: the cross-SOURCE contamination matrix — word-3gram
    * Jaccard between every pair of sources' distinct shingle vocabularies.
    * Per-document dedup answers "is this doc a copy"; this answers the
    * corpus-curation question one level up: WHICH FEEDS are re-crawling
    * each other (a high-overlap source pair means one should be dropped or
    * down-weighted BEFORE paying per-doc dedup on its documents —
    * the mix/cap decisions of q_mix_sources and q_source_cap want exactly
    * this signal).
    *
    * Scale shape: the unit of work collapses from documents to the
    * (source, gram) DISTINCT frame — Heaps-law-bounded vocabulary × source
    * count, orders of magnitude smaller than the corpus. The gram
    * self-join's per-gram fanout is bounded by the SOURCE CARDINALITY
    * (≤ S per gram, so ≤ S²/2 pairs per gram), not by document counts —
    * no df cap needed, unlike the per-doc pair queries where fanout grows
    * with corpus size. Two shuffles total: the distinct, then the
    * gram-keyed intersection count; source sizes broadcast back.
    *
    * Null semantics: a NULL text contributes NO grams (the native
    * shingle kernel is null-safe, so explode drops the row); the oracle
    * states the same via `WHERE text IS NOT NULL` — without it DuckDB's
    * CASE falls through to `[tt]` = `[NULL]` and a null-text doc would
    * inflate its source's vocabulary size. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("source"), explode(Dedup.shingles3(col("text"))).as("gram"))
      .distinct()
    val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))),
        Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceOverlapSql: String =
    """WITH toks AS (SELECT source, trim(text) AS tt,
      |                regexp_split_to_array(trim(text), '\s+') AS t
      |         FROM documents WHERE text IS NOT NULL),
      |sh AS (SELECT source,
      |         CASE WHEN len(t) >= 3
      |           THEN list_distinct(list_transform(range(1, len(t)-1),
      |                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |           ELSE [tt] END AS grams
      |       FROM toks),
      |ex0 AS (SELECT source, unnest(grams) AS gram FROM sh),
      |ex AS (SELECT DISTINCT source, gram FROM ex0),
      |n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ex GROUP BY source),
      |inter AS (SELECT a.source AS src_a, b.source AS src_b,
      |            CAST(COUNT(*) AS BIGINT) AS n_shared
      |          FROM ex a JOIN ex b ON a.gram = b.gram AND a.source < b.source
      |          GROUP BY 1, 2)
      |SELECT src_a, src_b, n_shared,
      |  ROUND(CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared), 6) AS jaccard
      |FROM inter
      |JOIN n na ON src_a = na.source
      |JOIN n nb ON src_b = nb.source
      |ORDER BY src_a, src_b""".stripMargin

  /** The tokenize → positional-gram → ≥2-occurrence-flag CTE prefix
    * shared by BOTH span oracles (the [[shinglesCte]] discipline: ONE
    * definition, so the find side — q_dedup_spans — and the cut side —
    * q_dedup_cut — can never desynchronize). The flag joins on RAW gram
    * strings via a count window, mirroring [[Dedup.duplicateSpans]]'
    * collision-free formulation exactly. */
  private val spanFlagCte: String = {
    val L = Dedup.SpanGram
    s"""t AS (SELECT doc_id,
       |    regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
       |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |    list_aggregate(t[i:i+${L - 1}], 'string_agg', ' ') AS gram
       |  FROM t, UNNEST(range(1, len(t) - ${L - 1} + 1)) AS u(i)),
       |fl AS (SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gram) AS c FROM g)
       |  WHERE c >= 2)""".stripMargin
  }

  /** Q-dedup-spans: see [[Dedup.duplicateSpans]]. */
  def dedupSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpans(Tables.documents(spark, dir))

  val dedupSpansSql: String = {
    val L = Dedup.SpanGram
    s"""WITH $spanFlagCte,
       |ni AS (SELECT doc_id, pos,
       |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $L
       |         THEN 0 ELSE 1 END AS ni FROM fl),
       |isl AS (SELECT doc_id, pos,
       |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM ni)
       |SELECT doc_id, MIN(pos) AS span_start,
       |  MAX(pos) + ${L - 1} AS span_end,
       |  MAX(pos) + ${L - 1} - MIN(pos) + 1 AS span_tokens,
       |  COUNT(*) AS n_dup_grams
       |FROM isl GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin
  }

  /** Q-dedup-cut: see [[Dedup.applyCuts]]. */
  def dedupCut(spark: SparkSession, dir: String): DataFrame =
    Dedup.applyCuts(Tables.documents(spark, dir))

  val dedupCutSql: String = {
    val L = Dedup.SpanGram
    s"""WITH $spanFlagCte,
       |cov AS (SELECT DISTINCT doc_id, pos + d AS idx
       |  FROM fl, UNNEST(range(0, $L)) AS r(d)),
       |toks AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, t[i] AS tok
       |  FROM t, UNNEST(range(1, len(t) + 1)) AS u(i)),
       |kept AS (SELECT toks.* FROM toks ANTI JOIN cov USING (doc_id, idx)),
       |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_clean
       |  FROM kept GROUP BY doc_id),
       |cuts AS (SELECT doc_id, COUNT(*) AS n_cut FROM cov GROUP BY doc_id)
       |SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_tokens,
       |  COALESCE(c.n_cut, 0) AS n_cut,
       |  COALESCE(a.text_clean, '') AS text_clean
       |FROM t b LEFT JOIN cuts c USING (doc_id) LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Band configurations over the 16-slot signature — (bands, rows/band),
    * loosest to strictest. The S-curve midpoint (1/b)^(1/r) moves from
    * ~0.06 at 16×1 to ~0.84 at 2×8: the blocking dial. */
  val BandConfigs: Seq[(Int, Int)] = Seq((16, 1), (8, 2), (4, 4), (2, 8))

  /** Recall floor the chosen config must clear, and the exact-Jaccard
    * threshold defining the truth pairs it is measured against. */
  val BandTuneTarget = 0.9
  val BandTruthJaccard = 0.8

  /** Q-band-tune: the DEDUP member of the tuning family (q_nprobe_tune /
    * q_lsh_tune are the ANN members) — a precision/recall frontier over
    * MinHash-LSH band configurations, measured against the exact
    * full-gram Jaccard ≥ [[BandTruthJaccard]] truth. q_dedup_minhash
    * hard-codes 8×2 banding with an S-curve comment; this query MEASURES
    * the whole dial: per configuration, candidates = distinct pairs
    * agreeing on ≥1 band hash; precision = how much of the blocking
    * budget hits true duplicates, recall = how many true pairs the blocking
    * admits at all (a pair LSH never proposes is a duplicate the gated
    * pipeline can never remove). `chosen` = the STRICTEST config (fewest
    * candidates — the blocking cost) whose recall clears
    * [[BandTuneTarget]].
    *
    * Scale shape: signatures and the banded self-joins are the
    * q_dedup_minhash machinery (doc_id + fixed-width tuples through every
    * shuffle); the truth stage is the ONE deliberately exact pass — a
    * gram-postings intersection with NO df cap (it must measure the same
    * full-set Jaccard the gated pipeline verifies with), safe on this
    * corpus (max df 25) and run over a document SAMPLE at 100 TB exactly
    * as the ANN tunes sample queries. Fully oracle-replayable: LCG
    * minhash constants and md5 band hashes are shared literals. */
  def bandTune(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val sigs = Dedup.minhashSignatures(docs).localCheckpoint(eager = true)
    val ex = docs.select(col("doc_id"),
      explode(Dedup.shingles3(col("text"))).as("gram"))
    val n = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    val truth = inter
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("i").cast("double") /
        (col("na") + col("nb") - col("i")).cast("double") >= BandTruthJaccard)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(eager = true) // truth pairs, reused per config
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val rows = BandConfigs.map { case (b, r) =>
      val bands = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(b - 1)),
          k => md5(concat_ws(",",
            (1 to r).map(i => element_at(col("sig"), k * r + lit(i))): _*)))))
        .toDF("doc_id", "band_idx", "band_hash")
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .localCheckpoint(eager = true) // reused by n_cand and n_hit
      val nc = cand.agg(count(lit(1)).as("n_cand"))
      val nh = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      nc.crossJoin(nh).crossJoin(nTruth)
        .select(lit(b).as("n_bands"), lit(r).as("n_rows"),
          col("n_cand"), col("n_truth"), col("n_hit"),
          when(col("n_cand") > 0,
            round(col("n_hit").cast("double") / col("n_cand").cast("double"), 6))
            .as("precision"),
          round(col("n_hit").cast("double") /
            col("n_truth").cast("double"), 6).as("recall"))
    }.reduce(_ unionByName _)
    rows
      .withColumn("chosen",
        col("n_rows") === max(when(col("recall") >= BandTuneTarget,
          col("n_rows"))).over(Window.partitionBy()))
      .orderBy(col("n_rows"))
  }

  val bandTuneSql: String = {
    val sigCte =
      s"""hs AS (SELECT doc_id,
         |         list_transform(grams, g -> CAST('0x' || substr(md5(g),1,12) AS BIGINT)) AS hs
         |       FROM sh),
         |sig AS MATERIALIZED (SELECT doc_id,
         |          list_transform(range(0, ${Dedup.MinhashFns}),
         |            j -> list_min(list_transform(hs,
         |                   h -> (((1103515245*(j+1) + 12345) % ${Dedup.MinhashPrime})
         |                          * (h % ${Dedup.MinhashPrime})
         |                         + ((69069*(j+1) + 1234567) % ${Dedup.MinhashPrime}))
         |                        % ${Dedup.MinhashPrime}))) AS sig
         |        FROM hs)""".stripMargin
    val candCtes = BandConfigs.map { case (b, r) =>
      val slots = (1 to r).map(i => s"CAST(sig[$r*rg.k+$i] AS VARCHAR)")
        .mkString(" || ',' || ")
      s"""bands_${b}x$r AS (SELECT doc_id, rg.k AS band_idx, md5($slots) AS band_hash
         |  FROM sig, range(0, $b) rg(k)),
         |cand_${b}x$r AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands_${b}x$r a JOIN bands_${b}x$r b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id)""".stripMargin
    }.mkString(",\n")
    val sweep = BandConfigs.map { case (b, r) =>
      s"""SELECT $b AS n_bands, $r AS n_rows,
         |  (SELECT COUNT(*) FROM cand_${b}x$r) AS n_cand,
         |  (SELECT n_truth FROM nt) AS n_truth,
         |  (SELECT COUNT(*) FROM cand_${b}x$r c
         |   JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hit""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $shinglesCte,
       |ex AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
       |n AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |          FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |truth AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN n na ON doc_a = na.doc_id
       |  JOIN n nb ON doc_b = nb.doc_id
       |  WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= $BandTruthJaccard),
       |nt AS (SELECT COUNT(*) AS n_truth FROM truth),
       |$sigCte,
       |$candCtes,
       |sweep AS (
       |$sweep
       |)
       |SELECT n_bands, n_rows, n_cand, n_truth, n_hit,
       |  CASE WHEN n_cand > 0
       |    THEN ROUND(CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE), 6) END AS precision,
       |  ROUND(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE), 6) AS recall,
       |  n_rows = MAX(CASE WHEN ROUND(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE), 6) >= $BandTuneTarget
       |               THEN n_rows END) OVER () AS chosen
       |FROM sweep ORDER BY n_rows""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_band_tune" -> (bandTune _),
    "q_dedup_cut" -> (dedupCut _),
    "q_dedup_spans" -> (dedupSpans _),
    "q_source_overlap" -> (sourceOverlap _),
    "q_dup_gram_frac" -> (dupGramFrac _),
    "q_dedup_exact" -> (dedupExact _),
    "q_dedup_ngram" -> (dedupNgram _),
    "q_containment" -> (dedupContainment _),
    "q_dedup_gated" -> (dedupGated _),
    "q_dedup_clusters" -> (dedupClusters _),
    "q_dedup_minhash" -> (dedupMinhash _),
    "q_dedup_simhash" -> (dedupSimhash _),
    "q_dedup_embed" -> (dedupEmbed _),
    "q_dedup_embed_lsh" -> (dedupEmbedLsh _))

  def oracles: Map[String, String] = Map(
    "q_band_tune" -> bandTuneSql,
    "q_dedup_cut" -> dedupCutSql,
    "q_dedup_spans" -> dedupSpansSql,
    "q_source_overlap" -> sourceOverlapSql,
    "q_dup_gram_frac" -> dupGramFracSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_ngram" -> dedupNgramSql,
    "q_containment" -> dedupContainmentSql,
    "q_dedup_gated" -> dedupGatedSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_dedup_minhash" -> dedupMinhashSql,
    "q_dedup_simhash" -> dedupSimhashSql,
    "q_dedup_embed" -> dedupEmbedSql,
    "q_dedup_embed_lsh" -> dedupEmbedLshSql)
}
