package graft.operators

import graft.functions.TextFunctions.fingerprint
import graft.functions.VectorFunctions.cosineSimPrenormed
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite — the north-star LLM-training-pipeline operators
  * (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine), each a
  * `DataFrame => DataFrame` designed around its 100 TB shuffle shape:
  *
  *  - exact: one shuffle on the 16-byte fingerprint, not the document text;
  *  - n-gram Jaccard: exact pairwise similarity via a shingle inverted
  *    index (explode → group per gram → emit the doc-list's pairs).
  *    Correct but quadratic in per-gram document frequency — the df-cap
  *    bounds that, and at scale it runs AFTER an LSH prefilter (below),
  *    never on the raw corpus;
  *  - MinHash LSH: signatures are one map-side pass; candidate generation
  *    shuffles only (band_idx, band_hash, doc_id) tuples — the classic
  *    sub-quadratic near-dup path;
  *  - SimHash: banding on 8-bit chunks gives EXACT recall for hamming ≤ 3
  *    by pigeonhole (4 chunks, ≤3 differing bits ⇒ ≥1 chunk equal), so the
  *    banded join is a lossless optimization of the quadratic scan;
  *  - embedding near-dup: label-blocked cosine join (the clustering/IVF
  *    analog of LSH blocking for dense vectors).
  *
  * All hashes route through md5 prefixes (48-bit) so DuckDB reproduces
  * them bit-for-bit; xxhash64 would be faster but engine-private.
  */
object Dedup {

  /** 48-bit portable hash: first 12 hex chars of md5 as a bigint (native
    * digest-bytes expression; same value as
    * `conv(substring(md5(c),1,12),16,10)` without the hex-string
    * round-trip). */
  def hash48(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.Md5Prefix48(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Window length (tokens) for [[duplicateSpans]]' positional grams. */
  val SpanGram = 8

  /** Gram starts (doc_id, pos) of [[SpanGram]]-token windows occurring
    * ≥2 times corpus-wide — the shared core of [[duplicateSpans]] (span
    * reporting) and [[applyCuts]] (span removal).
    *
    * The positional gram stream is the NATIVE non-distinct
    * [[graft.functions.WordNGramShingles]] (every sliding window in
    * order, empty for sub-n docs), so posexplode indices ARE the window
    * starts. The first formulation built grams with a higher-order
    * `transform` whose lambda referenced the un-materialized `split` —
    * re-tokenizing the doc once PER WINDOW, O(tokens²) per doc and 5.5×
    * slower at sf0.1 (6.3 s vs 1.15 s); the kernel tokenizes once.
    *
    * Two deliberate choices, both because the downstream cut is
    * DESTRUCTIVE:
    *  - the key is the RAW gram string, not a 48-bit hash: at ~10⁹
    *    positional grams, birthday collisions at 48 bits would falsely
    *    flag ~millions of unique windows, and since the oracle would
    *    hash identically the gate could never catch a false cut. A
    *    collision is benign for a similarity SIGNAL (MinHash/SimHash);
    *    for cutting text it is silent data loss. The string key costs
    *    shuffle bytes (~8 tokens/row), which is the right trade.
    *  - frequency is a COUNT window over the gram partition, not a
    *    groupBy + self-join: one scan, one exchange, and a hot
    *    boilerplate gram costs its posting count linearly (the window
    *    buffers per-partition and spills; the join formulation would
    *    re-scan + re-shingle the whole corpus for the probe side —
    *    PLANS.md showed two independent FileScan+Generate pipelines). */
  private def flaggedPositions(docs: DataFrame): DataFrame = {
    val sh = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.WordNGramShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("text")),
        SpanGram, distinct = false))
    val w = Window.partitionBy(col("gram"))
    docs
      .select(col("doc_id"), posexplode(sh).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("gram"))
      .withColumn("c", count(lit(1)).over(w))
      .filter(col("c") >= 2)
      .select(col("doc_id"), col("pos"))
  }

  /** Per-doc DUPLICATED-SPAN cut lists — the exact-substring-dedup
    * output shape (dedup the repeated PASSAGE, keep the document): for
    * every doc, the merged token ranges covered by [[SpanGram]]-token
    * windows that occur ≥2 times anywhere in the corpus (intra-doc
    * repeats included). This is what a cleaner consumes to cut
    * boilerplate/licenses/quoted chunks out of otherwise-unique docs —
    * the operation document-level dedup (exact/MinHash/Jaccard) cannot
    * express, since a doc with one stolen paragraph keeps Jaccard ≈ 0.
    *
    * Scale shape — two LINEAR shuffles, never a pair join: positional
    * grams are a map-side kernel projection; S(gram) flags ≥2-occurrence
    * windows with one count window ([[flaggedPositions]]); S(doc_id)
    * merges flagged positions into spans with one gaps-and-islands
    * window. Span merge rule: windows starting ≤ [[SpanGram]] apart
    * overlap or touch, so consecutive flagged positions with gap ≤
    * SpanGram fuse. */
  def duplicateSpans(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flaggedPositions(docs)
      .withColumn("ni",
        when(col("pos") - lag(col("pos"), 1).over(w) <= SpanGram, 0)
          .otherwise(1))
      .withColumn("island", sum(col("ni")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + SpanGram - 1).as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_dup_grams"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** Apply the [[duplicateSpans]] cut lists: every doc comes back with
    * the corpus-duplicated token ranges REMOVED (the cleaner's side of
    * the find→cut loop). A token is cut iff some flagged window covers
    * it; coverage explodes each flagged start into its [[SpanGram]]
    * indices (flagged-count × SpanGram rows, span-proportional not
    * corpus-proportional), distincts, and anti-joins the token stream.
    * The cleaned text reassembles via a deterministic sort_array over
    * (idx, token) structs — collect_list alone is order-nondeterministic
    * under partitioned aggregation. Output is TOKEN-accurate, not
    * byte-accurate: text_clean is the kept token stream rejoined with
    * single spaces, so a doc with nothing to cut returns its full token
    * sequence (n_cut = 0) with original inter-token whitespace
    * normalized — the module's tokenization convention, not a lossless
    * copy of `text`. */
  def applyCuts(docs: DataFrame): DataFrame = {
    val t = split(trim(col("text")), "\\s+")
    val base = docs.select(col("doc_id"), t.as("t"))
    val tokens = base
      .select(col("doc_id"), posexplode(col("t")).as(Seq("idx", "tok")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"), col("tok"))
    val covered = flaggedPositions(docs)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + SpanGram - 1)).as("idx"))
      .distinct()
    val cleaned = tokens.join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", transform(
        sort_array(collect_list(struct(col("idx"), col("tok")))),
        s => s.getField("tok"))).as("text_clean"))
    val cuts = covered.groupBy(col("doc_id")).agg(count(lit(1)).as("n_cut"))
    // Null-text guard: legacy size(NULL) = -1 while the oracle's len(t)
    // is NULL — agree on NULL so a null-text doc can't hash-diverge.
    base.select(col("doc_id"),
        when(col("t").isNull, lit(null))
          .otherwise(size(col("t"))).cast("long").as("n_tokens"))
      .join(cuts, Seq("doc_id"), "left")
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .orderBy(col("doc_id"))
  }

  /** Distinct word 3-gram shingles (whole text as a single shingle for
    * docs shorter than 3 tokens). Backed by the native
    * [[graft.functions.WordNGramShingles]] expression — the equivalent
    * higher-order-function form is interpreted and was the dominant cost
    * of every shingle-based dedup query (13.5s of a 28s run at sf0.1). */
  def shingles3(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.WordNGramShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), 3))

  /** Non-distinct word n-gram STREAM (every sliding window in order;
    * empty for sub-n docs) — the frequency-analysis twin of [[shingles3]],
    * shared by any operator needing n-gram counts (CorpusOps.repetition). */
  def ngramStream(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.WordNGramShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), n, distinct = false))

  /** Exact dedup: keep the lowest-id document per normalized-text
    * fingerprint. The shuffle key is the md5, so text bytes never move. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol))
    docs
      .withColumn("fp", fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact pairwise word-3gram Jaccard ≥ threshold via a shingle inverted
    * index. `grams` per doc are distinct, so |A∩B| is a pair count and
    * |A∪B| = |A|+|B|−|A∩B|.
    *
    * `maxDf` is the standard document-frequency cap of inverted-index
    * dedup: a gram appearing in more than `maxDf` documents is a stopword
    * phrase — it carries no near-duplicate signal but contributes O(df²)
    * pairs to the self-join, the skew bomb that kills this shape at scale
    * (one gram in 1M docs = 5·10¹¹ pairs in one task). Dropping it bounds
    * every gram's fanout at maxDf²/2 while leaving discriminative grams —
    * and therefore the ≥ 0.8 pair set — untouched (verified identical on
    * the testdata at all three SFs, where max df is 25). Jaccard is then
    * over the capped gram sets on BOTH engines, a self-consistent
    * similarity over discriminative grams. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
                        maxDf: Int = 32): DataFrame =
    gramPairStats(docs, maxDf)
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))

  /** Asymmetric containment |A∩B|/|A| ≥ threshold — catches SUBSET
    * duplication (a doc wholly embedded in a larger one), which symmetric
    * Jaccard misses: a 100-gram doc inside a 10000-gram doc has Jaccard
    * ≈ 0.01 but containment 1.0. Emits ordered pairs (doc_a contained in
    * doc_b); both directions of each unordered intersection are tested, so
    * mutual near-copies yield two rows. Same inverted-index shuffle shape
    * (and df cap) as [[ngramJaccardPairs]] — the direction split is a
    * map-side projection after the pair stats. */
  def containmentPairs(docs: DataFrame, threshold: Double,
                       maxDf: Int = 32): DataFrame =
    // Both directions from ONE pass over the pair stats: exploding a
    // 2-struct array is a map-side projection, where a union of two
    // branches would re-run the whole inverted-index pipeline per branch
    // (two corpus scans at scale; measured 1.25× the runtime at sf0.1).
    gramPairStats(docs, maxDf)
      .select(explode(array(
        struct(col("doc_a"), col("doc_b"),
          (col("i").cast("double") / col("na").cast("double")).as("containment")),
        struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
          (col("i").cast("double") / col("nb").cast("double")).as("containment"))))
        .as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.containment").as("containment"))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("containment"), 6).as("containment"))

  /** Shared core of the exact pairwise-overlap family: for every unordered
    * doc pair with at least one common (df-capped) gram, the intersection
    * size `i` and both docs' kept-gram counts `na`/`nb`. See
    * [[ngramJaccardPairs]] for the scale analysis of each step. */
  private def gramPairStats(docs: DataFrame, maxDf: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), shingles3(col("text")).as("grams"))
    // Join on a 64-bit hash of the gram, not the ~90-char string: the
    // shuffle moves 8-byte keys and the join compares longs. Distinct grams
    // stay distinct w.h.p. (27k grams → collision odds ~4e-11; the DuckDB
    // oracle joins on the raw string and would flag a collision).
    val ex0 = toks.select(col("doc_id"),
      explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gram"))
    pairStatsFromPostings(ex0, maxDf)
  }

  /** The inverted-index pair machinery over ANY distinct postings frame
    * `(doc_id, gram)` — shared by word-shingle overlap ([[gramPairStats]])
    * and winnowed-fingerprint overlap ([[graft.operators.TextOps]]'s MOSS
    * query). Same df cap, same bounded collect_list, same double-explode
    * pair generation; see [[ngramJaccardPairs]] for the per-step scale
    * analysis. */
  private[operators] def pairStatsFromPostings(ex0: DataFrame, maxDf: Int): DataFrame = {
    // df-cap via the DROPPED set, not the kept set: grams with df > maxDf
    // are stopword phrases — a tiny table by construction (the cap only
    // catches high-frequency grams), so it BROADCASTS, and the filter is
    // a broadcast ANTI join — ex stays map-side, no shuffle of the
    // (corpus-sized) exploded frame. The round-3 form inner-joined against
    // the KEPT grams (nearly all grams — corpus-sized at scale), paying a
    // full shuffle join for the same filter (+48% on the query). The df
    // pass itself is a partial-aggregated count — O(1) buffer per gram
    // per task, no skew exposure.
    val dropped = ex0.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("gram"))
    val ex = ex0.join(broadcast(dropped), Seq("gram"), "left_anti")
    // Pair generation from the inverted index DIRECTLY: group each gram's
    // doc list and emit its pairs by double explode — ONE shuffle of the
    // exploded frame, where a gram self-join would shuffle it, sort both
    // sides, and probe (measured 1.5× slower at sf0.1 for identical
    // output). The collect_list buffers are bounded at maxDf BY
    // CONSTRUCTION (hot grams were anti-joined away above) — without that
    // pre-filter this aggregation would be the skew bomb reborn as an
    // O(df) reducer buffer.
    val byGram = ex.groupBy(col("gram"))
      .agg(collect_list(col("doc_id")).as("docs"))
    // per-doc kept-gram count: partial count combines map-side, the
    // shuffle moves one (doc_id, count) row per doc per partition
    val n = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = byGram
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("i"), col("na"), col("nb"))
  }

  // MinHash parameters: 16 hash functions h_j(x) = (a_j·(x mod p) + b_j) mod p
  // over the Mersenne prime p = 2^31−1. The modulus must be SMALLER than the
  // 48-bit base hash so the reduction actually wraps: with a too-large prime
  // the maps are monotone in x and every slot's min is determined by the one
  // minimum base hash — a degenerate family whose agreement estimate is
  // always exactly 0 or 1 (found in review; the oracle mirrored the same
  // degenerate arithmetic and could not catch it). a_j/b_j are fixed LCG
  // constants reduced mod p; products stay ≤ (p−1)² < 2^62, inside long.
  val MinhashFns = 16
  val MinhashPrime: Long = (1L << 31) - 1
  val LshBands = 8 // 8 bands × 2 rows: P(candidate) at J=0.98 ≈ 1−(1−0.98²)⁸ ≈ 1−1e-12

  /** Per-slot multipliers/offsets (nonzero mod p, deterministic). */
  def minhashA(j: Int): Long = (1103515245L * (j + 1) + 12345L) % MinhashPrime
  def minhashB(j: Int): Long = (69069L * (j + 1) + 1234567L) % MinhashPrime

  /** 16-slot MinHash signatures, computed relationally: explode shingles,
    * hash each once, and take the 16 mins as grouped aggregates. The
    * equivalent nested higher-order-function form (`array_min` over a
    * `transform` per slot) is interpreted per-lambda-eval and measured an
    * order of magnitude slower at 5000 docs; the explode/groupBy shape is
    * whole-stage-codegen'd, combines map-side, and shuffles only
    * (doc_id, 16 longs) per doc — the shape that holds at 100 TB. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val ex = docs
      .select(col("doc_id"), explode(shingles3(col("text"))).as("gram"))
      .withColumn("h", hash48(col("gram")))
    val minCols = (0 until MinhashFns).map(j =>
      min(pmod(lit(minhashA(j)) * pmod(col("h"), lit(MinhashPrime)) + lit(minhashB(j)),
        lit(MinhashPrime))).as(s"m$j"))
    ex.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until MinhashFns).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** Banded frame `(doc_id, band_idx, band_hash)` from a signature frame —
    * the LSH blocking key. Carries ONLY the band tuple: the 16-long
    * signature must not ride through the 8× band explode, the join, and
    * the distinct — at scale that is 8× the shuffle bytes for no
    * information. Shared by the self-join candidates below and the
    * batch-vs-corpus incremental path ([[PipelineOps.incrementalDedup]]). */
  def lshBands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(LshBands - 1)),
        k => md5(concat_ws(",",
          element_at(col("sig"), k * 2 + 1), element_at(col("sig"), k * 2 + 2))))))
      .toDF("doc_id", "band_idx", "band_hash")

  /** LSH candidate pairs + signature-agreement estimate of Jaccard.
    * Candidates = docs sharing ≥1 of 8 two-row band hashes; estimate =
    * fraction of the 16 minhashes that agree; `minEstimate` suppresses
    * chance band collisions. */
  def minhashLshPairs(docs: DataFrame, minEstimate: Double): DataFrame = {
    val sigs = minhashSignatures(docs)
    val bands = lshBands(sigs)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (s, x) => s + x)
          .cast("double") / lit(MinhashFns.toDouble))
      .filter(col("est_jaccard") >= minEstimate)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** The scale-safe near-dup pipeline (SCALE.md's "run the exact Jaccard
    * behind an LSH prefilter", now enforced as a composition): MinHash-LSH
    * banding proposes candidate pairs sub-quadratically, then exact
    * word-3gram Jaccard verifies ONLY those candidates. No gram-level
    * self-join ever touches the full corpus — the corpus-wide shuffles are
    * the signature aggregation and the banded candidate join, both moving
    * (doc_id, fixed-width) tuples; verification joins the small candidate
    * set back to per-doc gram arrays and intersects per pair. At J ≥ 0.8
    * with 8×2 banding the candidate-miss probability is
    * 1−(1−0.8²)⁸ ≈ 2e-4 per pair (≈1e-12 at the planted J≈0.98), vs the
    * unguarded quadratic join's skew bomb on any hot gram.
    *
    * Measure note: verification here is Jaccard over the FULL gram sets —
    * this path needs no df cap for safety (banding bounds the candidates).
    * [[ngramJaccardPairs]] measures Jaccard over df-CAPPED gram sets (its
    * cap is structural, and its oracle mirrors the capped measure). The
    * two agree exactly whenever no gram's df exceeds the cap (true of the
    * testdata, max df 25 < 32); on a corpus with hotter grams they are
    * deliberately different estimators — capped-set Jaccard discounts
    * stopword phrases, full-set Jaccard counts them. */
  def nearDupPairs(docs: DataFrame, threshold: Double,
                   minEstimate: Double = 0.5): DataFrame =
    verifyCandidates(docs,
      minhashLshPairs(docs, minEstimate).select(col("doc_a"), col("doc_b")),
      threshold)

  /** The exact-Jaccard VERIFICATION stage of the gated pipeline, over any
    * candidate pair frame — shared by the from-scratch composition above
    * and the persisted-index path
    * ([[graft.sources.MinhashIndex]].dedupGatedIndexed), so both serve
    * literally the same arithmetic. Joins the (small) candidate set back
    * to per-doc gram arrays and intersects per pair — work ∝ candidates,
    * never corpus². */
  def verifyCandidates(docs: DataFrame, cand: DataFrame,
                       threshold: Double): DataFrame = {
    val grams = docs.select(col("doc_id"), shingles3(col("text")).as("grams"))
    cand
      .join(grams.select(col("doc_id").as("doc_a"), col("grams").as("grams_a")), "doc_a")
      .join(grams.select(col("doc_id").as("doc_b"), col("grams").as("grams_b")), "doc_b")
      .withColumn("i", size(array_intersect(col("grams_a"), col("grams_b"))))
      .withColumn("jaccard", col("i").cast("double") /
        (size(col("grams_a")) + size(col("grams_b")) - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Connected-component resolution over near-dup pairs — the step that
    * turns a PAIR list into a DROP decision. Pairwise output alone
    * over-deletes: if A~B and B~C, dropping "the later of each pair"
    * removes B and C even though C may only be transitively similar.
    * Components group A,B,C into one cluster with one survivor (the
    * lowest doc_id — same keep-lowest rule as [[exact]]).
    *
    * Algorithm: iterative min-label propagation — every node starts as its
    * own representative, each round takes the min of its own and its
    * neighbors' labels, until a fixpoint. Converges in O(component
    * diameter) rounds; near-dup clusters are near-cliques (diameter 1–2),
    * so 2–3 rounds in practice. Each round is one join + one groupBy on
    * doc ids, lineage cut by executor-side localCheckpoint (the k-means
    * pattern); the driver sees ONE scalar per round (the changed-label
    * probe), never rows. Returns (doc_id, rep) for every doc in a pair. */
  def resolveClusters(pairs: DataFrame): DataFrame = {
    // Pairs are unique (doc_a < doc_b) so the two-direction union is
    // dup-free — no distinct() shuffle needed; min-aggregation below is
    // insensitive to duplicates anyway.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true) // pairs come from the LSH pipeline — never recompute per round
    // Fold the first propagation hop into the init: every node appears as
    // src (both directions are in edges), so least(src, min(dst)) IS round
    // one — saving a full join+groupBy+checkpoint cycle.
    var labels = edges.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("doc_id"), least(col("src"), col("mn")).as("rep"))
      .localCheckpoint(true)
    var converged = false
    while (!converged) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("rep").as("nrep")), "dst")
        .groupBy(col("src")).agg(min(col("nrep")).as("min_n"))
        .withColumnRenamed("src", "doc_id")
      // Carry the previous label through the checkpoint so convergence is
      // a filter over the materialized partitions — no second join, and
      // the round costs exactly one shuffle (the neighbor-min groupBy).
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("rep").as("old_rep"),
          least(col("rep"), coalesce(col("min_n"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      val changed = next.filter(col("rep") =!= col("old_rep")).limit(1).count()
      labels = next.select(col("doc_id"), col("rep"))
      converged = changed == 0
    }
    labels
  }

  /** 32-bit SimHash over the doc's distinct word-3gram shingles: bit i is
    * the sign of Σ_g (±1 by bit i of hash48(g)). Shingles, not single
    * words — on a small vocabulary, word sets are near-identical across
    * unrelated docs and word-level simhash degenerates (measured: half of
    * all pairs within hamming 3).
    *
    * Relational form for the same codegen/scale reasons as
    * [[minhashSignatures]]: explode → 32 signed-bit sums as grouped
    * aggregates → pack. Bit i carries weight 2^(31−i). */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val ex = docs
      .select(col("doc_id"), explode(shingles3(col("text"))).as("gram"))
      .withColumn("h", hash48(col("gram")))
    val bitSums = (0 until 32).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$i"))
    ex.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(i =>
          when(col(s"s$i") > 0, lit(1L << (31 - i))).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs with simhash hamming distance ≤ maxHamming (≤ 3 for
    * exactness of the banded plan): candidates join on equality of one of
    * four 8-bit chunks — pigeonhole-lossless — then exact hamming filter. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only lossless for hamming <= 3")
    val sh = simhashSignatures(docs)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("simhash"), 8 * k).bitwiseAND(lit(255L))): _*)))
      .toDF("doc_id", "simhash", "chunk_idx", "chunk_val")
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // filter-before-distinct: hamming is determined by the pair, so this
      // is result-identical but dedups only near-dup pairs, not every
      // chunk-sharing candidate
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-dup pairs, blocked by `blockCol` so the pair
    * space is per-block quadratic, not global — the dense-vector analog of
    * LSH banding. The block is a precomputed cluster/label where one
    * exists, or an LSH bucket computed map-side where none does
    * (q_dedup_embed_lsh — the no-metadata path). Expects `vec_norm`
    * precomputed (KnnSearch.withNorm). */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
                            blockCol: String = "label"): DataFrame = {
    val a = emb.select(col(blockCol), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("vec_norm").as("norm_a"))
    val b = emb.select(col(blockCol), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("vec_norm").as("norm_b"))
    a.join(b, Seq(blockCol))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("score", cosineSimPrenormed(
        graft.functions.VectorFunctions.dotProduct(col("emb_a"), col("emb_b")),
        col("norm_a"), col("norm_b")))
      .filter(col("score") >= threshold)
      .select(col(blockCol), col("vec_a"), col("vec_b"),
        round(col("score"), 6).as("score"))
  }
}
