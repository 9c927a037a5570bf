package graft.operators

import graft.Tables
import graft.functions.TextFunctions.tokenCount
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus assembly operators (north-star LLM-data-pipeline
  * surface): sequence packing, overlap chunking, incremental cross-corpus
  * dedup, duplicate-cluster representative selection, and corpus-level
  * vocabulary similarity. The reference stops at per-line embedding
  * (`embed/embed.go:94-138`); these are the operators that turn its
  * corpus into model-ready training batches at 100 TB.
  */
object PipelineOps {

  /** Tokens per packed training sequence (q_pack_sequences). */
  val PackBudget = 1024L

  /** Range-bucket width for the distributed prefix sum: one bucket ≈ one
    * task's worth of docs. At 100 TB this is "tokens per task ≈ width ×
    * avg-doc-tokens" — sized so the per-bucket subtotal frame (one row
    * per bucket) stays driver-broadcastable (millions of rows at most). */
  val PackBucketWidth = 128L

  /** Q-pack-sequences: concat-and-chunk sequence packing — every doc gets
    * its token span `[start_tok, start_tok + n_tokens)` in the single
    * global token stream (docs concatenated in doc_id order), and the
    * budget-sized training sequences it lands in. This is the standard
    * "pack the corpus into fixed-length rows" step before LLM training;
    * docs may span sequence boundaries by design.
    *
    * The global running offset is a DISTRIBUTED two-phase prefix sum, not
    * one global window: a global `ORDER BY doc_id` window moves the whole
    * corpus to ONE partition (Spark warns exactly that) — dead at scale.
    * Instead: (1) per-range-bucket token subtotals (one shuffle to a
    * bucket-count-sized frame), (2) an exclusive prefix over that TINY
    * frame (single-partition window over #buckets rows — the driver-sized
    * step, same ladder as Spark's own zipWithIndex), broadcast-joined
    * back, (3) an intra-bucket exclusive window partitioned BY bucket —
    * parallel across buckets. Result is identical to the naive global
    * window; only the shuffle shape changes. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
    // integer div, not floor(/): `/` on longs is DOUBLE division — exact
    // only below 2^53, an avoidable cliff for a 100 TB id space
    val bucketed = docs.withColumn("pbucket",
      expr(s"doc_id DIV $PackBucketWidth"))
    val subtot = bucketed.groupBy(col("pbucket"))
      .agg(sum(col("n_tokens")).as("btok"))
    val wBuckets = Window.orderBy(col("pbucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtot
      .withColumn("boffset", coalesce(sum(col("btok")).over(wBuckets), lit(0L)))
      .select(col("pbucket"), col("boffset"))
    val wIntra = Window.partitionBy(col("pbucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("intra", coalesce(sum(col("n_tokens")).over(wIntra), lit(0L)))
      .join(broadcast(offsets), Seq("pbucket"))
      .withColumn("start_tok", col("boffset") + col("intra"))
      .withColumn("first_seq", expr(s"start_tok DIV $PackBudget"))
      .withColumn("last_seq",
        expr(s"(start_tok + greatest(n_tokens, 1L) - 1L) DIV $PackBudget"))
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        col("first_seq"), col("last_seq"),
        (col("last_seq") - col("first_seq") + lit(1L)).as("n_seqs"))
      .orderBy(col("doc_id"))
  }

  /** The oracle states the SAME semantics as the naive single window —
    * proving the two-phase prefix sum result-identical to it. */
  val packSequencesSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
       |  FROM documents),
       |s AS (SELECT doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
       |  FROM t)
       |SELECT doc_id, n_tokens, start_tok,
       |  start_tok // $PackBudget AS first_seq,
       |  (start_tok + greatest(n_tokens, 1) - 1) // $PackBudget AS last_seq,
       |  ((start_tok + greatest(n_tokens, 1) - 1) // $PackBudget)
       |    - (start_tok // $PackBudget) + 1 AS n_seqs
       |FROM s ORDER BY doc_id""".stripMargin

  val ChunkSize = 64L
  val ChunkStride = 48L

  /** Q-chunk-overlap: sliding token-window chunking (RAG / long-doc
    * training prep): each doc yields windows of [[ChunkSize]] tokens
    * starting every [[ChunkStride]] tokens, the final window truncated at
    * the doc end. Pure map-side explode — each doc's chunk list derives
    * from its own token count alone, so the operator scales linearly with
    * corpus size and parallelizes per-file. */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame =
    chunkSpans(Tables.documents(spark, dir))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"), col("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** The window core of [[chunkOverlap]] over an arbitrary documents
    * frame (needs a `text` column; every other input column rides
    * through to the exploded chunks) — so chunking composes
    * mid-pipeline (q_pipeline_e2e). */
  def chunkSpans(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", tokenCount(col("text")).cast("long"))
      .filter(col("n_tokens") > 0)
      .drop("text")
      .withColumn("n_chunks",
        lit(1L) + greatest(
          ceil((col("n_tokens") - lit(ChunkSize)).cast("double") / ChunkStride),
          lit(0L)))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_idx") * ChunkStride)
      .withColumn("chunk_len", least(lit(ChunkSize), col("n_tokens") - col("start_tok")))
      .drop("n_tokens", "n_chunks")

  val chunkOverlapSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |    1 + greatest(CAST(ceil((n_tokens - $ChunkSize) / $ChunkStride.0) AS BIGINT), 0) AS n_chunks
       |  FROM t WHERE n_tokens > 0),
       |e AS (SELECT doc_id, n_tokens, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
       |SELECT doc_id, chunk_idx, chunk_idx * $ChunkStride AS start_tok,
       |  least($ChunkSize, n_tokens - chunk_idx * $ChunkStride) AS chunk_len
       |FROM e ORDER BY doc_id, chunk_idx""".stripMargin

  /** The held-out "new batch" sources for the incremental queries. */
  val BatchSources: Seq[String] = Seq("src15", "src16", "src17", "src18", "src19")

  /** Q-dedup-incremental: near-dup dedup of a NEW batch against an
    * EXISTING corpus — the steady-state form of corpus dedup (a crawl
    * refresh is never deduped against itself from scratch; it is deduped
    * against the already-clean corpus). Same LSH-gate-then-exact-verify
    * composition as [[Dedup.nearDupPairs]], but the band join is
    * batch × corpus instead of a self-join: at 100 TB the corpus band
    * table is precomputed and persisted (the [[graft.sources.IndexCatalog]]
    * discipline), and the batch side — tiny by comparison — broadcasts,
    * so the incremental cost is proportional to the BATCH, not the
    * corpus. Every batch doc is returned with its verdict: `dup_of` = the
    * lowest corpus doc it near-duplicates (3-gram Jaccard ≥ 0.8), `keep` =
    * no such match. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val flagged = docs.select(col("doc_id"), col("text"),
      col("source").isin(BatchSources: _*).as("is_batch"))
    // signatures for the WHOLE corpus in one pass, split after — the
    // split is a column filter, not a second shingle computation
    val sigs = Dedup.minhashSignatures(flagged)
      .join(flagged.select(col("doc_id"), col("is_batch")), Seq("doc_id"))
    val bands = Dedup.lshBands(sigs.select(col("doc_id"), col("sig")))
      .join(sigs.select(col("doc_id"), col("is_batch")), Seq("doc_id"))
    val batchBands = bands.filter(col("is_batch"))
      .select(col("doc_id").as("doc_b"), col("band_idx"), col("band_hash"))
    val corpusBands = bands.filter(!col("is_batch"))
      .select(col("doc_id").as("doc_c"), col("band_idx"), col("band_hash"))
    val cand = corpusBands.join(broadcast(batchBands), Seq("band_idx", "band_hash"))
      .select(col("doc_b"), col("doc_c")).distinct()
    // exact verify on candidates only (the gated-dedup discipline)
    val grams = flagged.select(col("doc_id"), Dedup.shingles3(col("text")).as("grams"))
    val matches = cand
      .join(grams.select(col("doc_id").as("doc_b"), col("grams").as("grams_b")), "doc_b")
      .join(grams.select(col("doc_id").as("doc_c"), col("grams").as("grams_c")), "doc_c")
      .withColumn("i", size(array_intersect(col("grams_b"), col("grams_c"))))
      .withColumn("jaccard", col("i").cast("double") /
        (size(col("grams_b")) + size(col("grams_c")) - col("i")).cast("double"))
      .filter(col("jaccard") >= 0.8)
      .groupBy(col("doc_b")).agg(min(col("doc_c")).as("dup_of"))
    flagged.filter(col("is_batch")).select(col("doc_id"))
      .join(matches.withColumnRenamed("doc_b", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: brute-force exact Jaccard between the halves — proving the
    * LSH gate lossless on this corpus (planted pairs sit at J ≈ 0.98;
    * the analytic miss probability at the 0.8 threshold is ≈ 2e-4). */
  val incrementalDedupSql: String = {
    val batch = BatchSources.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, source, trim(text) AS tt,
       |                regexp_split_to_array(trim(text), '\\s+') AS t
       |         FROM documents),
       |sh AS (SELECT doc_id, source,
       |         CASE WHEN len(t) >= 3
       |           THEN list_distinct(list_transform(range(1, len(t)-1),
       |                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
       |           ELSE [tt] END AS grams
       |       FROM toks),
       |b AS (SELECT doc_id, grams FROM sh WHERE source IN ($batch)),
       |c AS (SELECT doc_id, grams FROM sh WHERE source NOT IN ($batch)),
       |m AS (SELECT b.doc_id AS doc_id, MIN(c.doc_id) AS dup_of
       |      FROM b JOIN c ON len(list_intersect(b.grams, c.grams)) * 1.0
       |           / (len(b.grams) + len(c.grams) - len(list_intersect(b.grams, c.grams))) >= 0.8
       |      GROUP BY b.doc_id)
       |SELECT d.doc_id, m.dup_of, m.dup_of IS NULL AS keep
       |FROM (SELECT doc_id FROM documents WHERE source IN ($batch)) d
       |LEFT JOIN m USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Q-cluster-rep: duplicate-cluster representative selection — the step
    * AFTER clustering that decides what actually ships to training: per
    * near-dup cluster, keep the highest-quality member (here: longest
    * text, ties to the lowest doc_id) instead of [[Dedup.resolveClusters]]'
    * blind lowest-id rule. One window over the (tiny) cluster-member set;
    * the heavy lifting is the upstream gated pipeline. */
  def clusterRepresentatives(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = Dedup.resolveClusters(
      Dedup.nearDupPairs(docs, 0.8).select(col("doc_a"), col("doc_b")))
    val w = Window.partitionBy(col("rep"))
      .orderBy(col("best_chars").desc, col("doc_id"))
    clusters
      .join(docs.select(col("doc_id"), col("n_chars").cast("long").as("best_chars")), "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("rep"))))
      .filter(col("rn") === 1)
      .select(col("rep").as("cluster"), col("n_members"),
        col("doc_id").as("best_doc"), col("best_chars"))
      .orderBy(col("cluster"))
  }

  val clusterRepresentativesSql: String =
    s"""WITH m AS (SELECT c.doc_id, c.rep, CAST(d.n_chars AS BIGINT) AS best_chars
       |           FROM (${DedupOps.dedupClustersSql}) c
       |           JOIN documents d USING (doc_id)),
       |r AS (SELECT rep, doc_id, best_chars,
       |        ROW_NUMBER() OVER (PARTITION BY rep ORDER BY best_chars DESC, doc_id) AS rn,
       |        COUNT(*) OVER (PARTITION BY rep) AS n_members
       |      FROM m)
       |SELECT rep AS cluster, CAST(n_members AS BIGINT) AS n_members,
       |  doc_id AS best_doc, best_chars
       |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin

  /** Q-source-sim: corpus-level vocabulary similarity — Jaccard over each
    * source's distinct token vocabulary, the mixing-diagnostics view that
    * tells a data curator which corpora are near-copies of each other
    * before any document-level work runs. Inverted-index shape: the join
    * key is the 8-byte token hash (equality-only use — engine-private
    * xxhash64 is fine), per-token fanout is bounded by the SOURCE count
    * (each token appears once per source after the distinct), so the pair
    * join is #tokens × #sources², never doc-quadratic. */
  def sourceSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .select(col("source"), xxhash64(col("w")).as("h"))
      .distinct()
    val n = tok.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = tok.as("a")
      .join(tok.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("overlap"))
    pairs
      .join(n.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(n.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("overlap"),
        round(col("overlap").cast("double") /
          (col("na") + col("nb") - col("overlap")).cast("double"), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("src_a"), col("src_b"))
      .limit(20)
  }

  val sourceSimilaritySql: String =
    """WITH tok AS (SELECT DISTINCT source, w FROM (
      |        SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |        FROM documents)),
      |n AS (SELECT source, COUNT(*) AS n FROM tok GROUP BY source),
      |p AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS overlap
      |      FROM tok a JOIN tok b ON a.w = b.w AND a.source < b.source
      |      GROUP BY 1, 2)
      |SELECT src_a, src_b, overlap,
      |  ROUND(overlap * 1.0 / (na.n + nb.n - overlap), 6) AS jaccard
      |FROM p JOIN n na ON na.source = src_a JOIN n nb ON nb.source = src_b
      |ORDER BY jaccard DESC, src_a, src_b LIMIT 20""".stripMargin

  /** Q-interleave: weighted domain-mixing schedule (stride scheduling) —
    * the deterministic "how do sources interleave in the training stream"
    * step after [[graft.operators.CorpusOps.mixSources]] decides RATES.
    * Every doc gets virtual time `rn / w` (rn = its rank within its
    * source, w = the source's mixing weight); reading in virtual-time
    * order yields each source at a rate proportional to its weight.
    * Per-source ranks are windows PARTITIONED by source — parallel across
    * sources; the output's global sort is a range partition, never a
    * single-partition window (no global row_number is materialized). */
  def interleave(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val weight = element_at(array(lit(4), lit(3), lit(2), lit(1)),
      pmod(srcNum, lit(4)) + 1)
    val wn = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("w", weight)
      .withColumn("rn", row_number().over(wn).cast("long"))
      .withColumn("mix_key", col("rn").cast("double") / col("w"))
      .select(col("doc_id"), col("source"), col("w"), col("rn"), col("mix_key"))
      .orderBy(col("mix_key"), col("source"), col("doc_id"))
  }

  val interleaveSql: String =
    """SELECT doc_id, source,
      |  ([4, 3, 2, 1])[(CAST(substr(source, 4) AS INT) % 4) + 1] AS w,
      |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS DOUBLE)
      |    / ([4, 3, 2, 1])[(CAST(substr(source, 4) AS INT) % 4) + 1] AS mix_key
      |FROM documents
      |ORDER BY mix_key, source, doc_id""".stripMargin

  /** Q-bpe-pairs: the inner counting step of BPE tokenizer TRAINING — the
    * most frequent adjacent character pairs across the corpus (each merge
    * iteration of byte-pair encoding picks exactly this argmax). Pure
    * map-side pair explode (each word's pairs derive from the word alone)
    * plus one count shuffle keyed by the 2-char pair. Words shorter than
    * 2 chars are filtered BEFORE the sequence — `sequence(1, 0)` yields
    * `[1, 0]`, not empty (the phantom-row trap). */
  def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
    terms
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  }

  val bpePairsSql: String =
    """WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |           FROM documents),
      |f AS (SELECT w FROM t WHERE len(w) >= 2),
      |e AS (SELECT w, unnest(range(1, len(w))) AS i FROM f)
      |SELECT substr(w, CAST(i AS INT), 2) AS pair, COUNT(*) AS n
      |FROM e GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin

  /** Merge steps for [[bpeTrain]] — fixed so runs are comparable. */
  val BpeMerges = 5

  /** BPE tokenizer training over a word-frequency table (`w`, `wc`):
    * [[BpeMerges]] iterations of count-adjacent-pairs → take the global
    * argmax → apply the merge (Sennrich et al. 2016). Returns the learned
    * merge table (rank, pair, weighted count) — the artifact a tokenizer
    * ships.
    *
    * Scale shape: BPE trains on the VOCABULARY (distinct words ×
    * frequency), which partial-aggregates out of any corpus size in one
    * pass; each iteration is then one pair-count aggregation over the
    * vocab frame (map-side combine), a 1-row TakeOrdered argmax collect
    * (driver metadata, the IVF-probe discipline), and a pure-map merge by
    * the native [[graft.functions.BpeMergePair]] kernel — with the
    * per-iteration `localCheckpoint` lineage cut of every iterative
    * operator here (k-means, PageRank). Ties break lexicographically so
    * training is deterministic. */
  def bpeTrainCore(words: DataFrame): DataFrame = {
    val spark = words.sparkSession
    var vocab = words
      .select(col("wc"), split(col("w"), "").as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    for (r <- 1 to BpeMerges) {
      val top = vocab
        .select(col("wc"), explode(arrays_zip(
          slice(col("s"), lit(1), size(col("s")) - 1).as("a"),
          slice(col("s"), lit(2), size(col("s")) - 1).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      top.headOption.foreach { t =>
        val (a, b) = (t.getString(0), t.getString(1))
        merges += org.apache.spark.sql.Row(r, a, b, t.getLong(2))
        vocab = vocab
          .withColumn("s", graft.functions.BpeMergePair.merge(col("s"), a, b))
          .localCheckpoint(true)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), MergeTableSchema)
  }

  /** Learned-merge-table schema, shared by both training paths. */
  private val MergeTableSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("merge_rank",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("sym_a",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("sym_b",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("pair_count",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** The PRODUCTION-SCALE twin of [[bpeTrainCore]]: aggregate the
    * vocabulary ONCE in Spark (the only pass that touches corpus-sized
    * data), collect the bounded (word, count) table to the driver, and
    * run the merge loop locally — the standard two-level BPE pattern
    * every industrial tokenizer trainer uses.
    *
    * Why this exists: [[bpeTrainCore]] schedules one Spark job PER MERGE
    * (pair-count aggregation + 1-row argmax collect). At the demo's 5
    * merges that is invisible; at a real tokenizer's 32k merges it is 32k
    * job schedules of a vocab-sized frame — scheduler-bound long before
    * it is data-bound. The vocabulary, by contrast, is Heaps-law bounded
    * (~millions of rows for a 100 TB corpus — hundreds of MB, driver-
    * safe), and once it is local each merge is a linear in-memory scan.
    * [[bpeTrainCore]] remains the all-Spark demonstration (and the path
    * for a vocabulary that genuinely cannot fit the driver); BpeTrainSpec
    * pins both paths to the identical merge table.
    *
    * Parity detail: tie-breaks compare symbols as UTF8String (Spark's
    * binary string ordering = code-point order), not java.lang.String
    * (UTF-16 code-unit order) — the two differ for supplementary-plane
    * characters, exactly the drift a parity-pinned twin must not have. */
  def bpeTrainLocal(words: DataFrame, nMerges: Int = BpeMerges): DataFrame = {
    import org.apache.spark.unsafe.types.UTF8String
    val spark = words.sparkSession
    var vocab: Array[(Array[String], Long)] = words.select(col("w"), col("wc"))
      .collect()
      .map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    for (r <- 1 to nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (s, wc) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + wc)
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.minBy { case ((a, b), n) =>
          (-n, UTF8String.fromString(a), UTF8String.fromString(b))
        }(Ordering.Tuple3(Ordering.Long,
          Ordering.comparatorToOrdering(
            java.util.Comparator.naturalOrder[UTF8String]()),
          Ordering.comparatorToOrdering(
            java.util.Comparator.naturalOrder[UTF8String]())))
        merges += org.apache.spark.sql.Row(r, a, b, n)
        vocab = vocab.map { case (s, wc) => (mergeLocal(s, a, b), wc) }
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), MergeTableSchema)
  }

  /** Driver-side mirror of [[graft.functions.BpeMergePair.compute]]
    * (leftmost-first, non-overlapping). */
  private def mergeLocal(s: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Q-bpe-train: the learned merge table over the documents corpus.
    * Iterative argmax training has no SQL twin — rows-only by design;
    * BpeTrainSpec pins the exact merge sequence on a hand-computed
    * vocabulary plus determinism on the real corpus. */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrainCore(
      Tables.documents(spark, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy(col("w")).agg(count(lit(1)).as("wc")))

  /** Q-bpe-encode: tokenize the corpus with the TRAINED merges — per-doc
    * BPE token accounting (the number a packing/budgeting pipeline
    * actually needs, where q_token_bpe approximates with a pre-tokenizer).
    * The learned merge table collects as [[BpeMerges]] rows of planner
    * metadata and applies as a chain of [[graft.functions.BpeMergePair]]
    * projections — all fused into ONE whole-stage-codegen map over the
    * exploded word stream; the only shuffle is the per-doc count
    * re-aggregation. Rows-only (the merges are data-dependent); gated by
    * BpeTrainSpec's compression and determinism asserts. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeTrain(spark, dir).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
    val merged = merges.foldLeft(words.withColumn("s", split(col("w"), ""))) {
      case (df, (a, b)) =>
        df.withColumn("s", graft.functions.BpeMergePair.merge(col("s"), a, b))
    }
    merged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_word_chars"),
        sum(size(col("s"))).cast("long").as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        round(col("n_word_chars").cast("double") / col("n_bpe_tokens").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  /** Q-readability: Flesch-style reading-ease scoring — the classic
    * document-quality signal alongside [[graft.operators.TextOps]]'s
    * punct/stopword ratios. Sentence count = punctuation-run count,
    * syllable proxy = vowel-group count; all three inputs are exact
    * integer regexp counts, so the only doubles are the two final
    * divisions — written identically on both engines. Pure map-side. */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    val words = tokenCount(col("text"))
    val sents = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
    val syl = greatest(regexp_count(lower(col("text")), lit("[aeiouy]+")), lit(1))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        words.as("n_words"), sents.as("n_sentences"), syl.as("n_syllables"),
        round(lit(206.835)
          - lit(1.015) * (words.cast("double") / sents)
          - lit(84.6) * (syl.cast("double") / greatest(words, lit(1))), 6)
          .as("flesch"))
      .orderBy(col("doc_id"))
  }

  val readabilitySql: String =
    """SELECT doc_id,
      |  CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
      |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
      |  greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS n_syllables,
      |  ROUND(206.835
      |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |    - 84.6 * (CAST(n_syllables AS DOUBLE) / greatest(n_words, 1)), 6) AS flesch
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q-pipeline-e2e: the whole training-data prep as ONE declarative
    * plan — exact dedup (lowest-id survivor per normalized-text
    * fingerprint) → Gopher quality gate → language routing (en) →
    * sliding-window chunking → per-source yield accounting. This is the
    * composition the individual queries exist FOR: a user of the
    * reference preps a corpus by chaining these stages, and declaring
    * them as one frame lets Catalyst fuse every map-side stage: the
    * gate, routing, and chunk explode all run inside the dedup
    * shuffle's output stage, so the whole gauntlet pays exactly four
    * exchanges regardless of stage count — the fingerprint partition
    * (with a PARTIAL WindowGroupLimit pruning dedup candidates before
    * the shuffle), the distinct-agg's two phases, and the presentation
    * sort. An orchestration of separate jobs would pay a full scan +
    * materialization per stage.
    *
    * Output: per source, documents surviving the full gauntlet, chunks
    * produced, tokens yielded — the "what did my pipeline keep"
    * accounting every corpus build ends with. */
  def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val survivors = Dedup.exact(docs)
    val gated = CorpusOps.gopherFlags(survivors)
      .filter(col("keep") === 1 && col("lang") === "en")
      .select(col("doc_id"), col("text"), col("source"))
    chunkSpans(gated)
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("n_tokens"))
      .orderBy(col("source"))
  }

  val pipelineE2eSql: String = {
    val stopSum = CorpusOps.gopherStopSumSql
    s"""WITH fps AS (SELECT doc_id, text, lang, source,
       |    md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
       |  FROM documents),
       |surv AS (SELECT doc_id, text, source FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
       |    FROM fps) WHERE rn = 1 AND lang = 'en'),
       |toks AS (SELECT doc_id, source,
       |    regexp_split_to_array(trim(text), '\\s+') AS t,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_words
       |  FROM surv),
       |m AS (SELECT doc_id, source, n_words,
       |    CASE WHEN n_words > 0 THEN ROUND(
       |      CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE)
       |        / n_words, 6) END AS mean_wl,
       |    CASE WHEN n_words > 0 THEN ROUND(
       |      1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / n_words, 6) END AS dup_frac,
       |    $stopSum AS n_stop
       |  FROM toks),
       |gated AS (SELECT doc_id, source, n_words AS n_tokens FROM m
       |  WHERE n_words >= 10 AND n_words <= 1000
       |    AND mean_wl IS NOT NULL AND mean_wl >= 2.0 AND mean_wl <= 12.0
       |    AND n_stop >= 2
       |    AND dup_frac IS NOT NULL AND dup_frac <= 0.5
       |    AND n_words > 0),
       |c AS (SELECT doc_id, source, n_tokens,
       |    1 + greatest(CAST(ceil((n_tokens - $ChunkSize) / $ChunkStride.0) AS BIGINT), 0) AS n_chunks
       |  FROM gated),
       |e AS (SELECT doc_id, source, n_tokens, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
       |SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
       |  CAST(SUM(least($ChunkSize, n_tokens - chunk_idx * $ChunkStride)) AS BIGINT) AS n_tokens
       |FROM e GROUP BY source ORDER BY source""".stripMargin
  }

  /** Shards for [[shardChunks]] — the training-export fan-out width. */
  val NShards = 16L

  /** Q-shard: deterministic sharding of the chunk stream — the LAST step
    * of training-data prep (after gate/dedup/chunk, the corpus must land
    * in N reproducible shards a trainer can consume in parallel). Shard
    * membership is the salted md5-prefix hash of (doc_id, chunk_idx) —
    * the q_split discipline: a pure function of identity, stable under
    * corpus growth, re-runs, and repartitioning, and independent of every
    * other hash-gated decision via the salt literal. Emits per-shard
    * accounting (docs, chunks, tokens); the near-uniform spread IS the
    * point — hash sharding load-balances the trainer without a sort.
    *
    * At scale the shard column is the `partitionBy` of the export write:
    * one directory per shard, written by every executor in parallel, no
    * global shuffle (the hash is map-side; the only exchange here is the
    * N-row accounting aggregate). */
  def shardChunks(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkSpans(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    chunks
      .withColumn("shard", pmod(Dedup.hash48(concat(
        col("doc_id"), lit(":"), col("chunk_idx"), lit(":shard"))), lit(NShards)))
      .groupBy(col("shard"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("n_tokens"))
      .orderBy(col("shard"))
  }

  val shardChunksSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |    1 + greatest(CAST(ceil((n_tokens - $ChunkSize) / $ChunkStride.0) AS BIGINT), 0) AS n_chunks
       |  FROM t WHERE n_tokens > 0),
       |e AS (SELECT doc_id, n_tokens, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
       |s AS (SELECT doc_id, chunk_idx,
       |    least($ChunkSize, n_tokens - chunk_idx * $ChunkStride) AS chunk_len,
       |    CAST('0x' || substr(md5(doc_id || ':' || chunk_idx || ':shard'), 1, 12) AS BIGINT)
       |      % $NShards AS shard
       |  FROM e)
       |SELECT shard, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
       |  CAST(SUM(chunk_len) AS BIGINT) AS n_tokens
       |FROM s GROUP BY shard ORDER BY shard""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shard" -> (shardChunks _),
    "q_pipeline_e2e" -> (pipelineE2e _),
    "q_pack_sequences" -> (packSequences _),
    "q_chunk_overlap" -> (chunkOverlap _),
    "q_dedup_incremental" -> (incrementalDedup _),
    "q_cluster_rep" -> (clusterRepresentatives _),
    "q_source_sim" -> (sourceSimilarity _),
    "q_interleave" -> (interleave _),
    "q_bpe_pairs" -> (bpePairs _),
    "q_bpe_train" -> (bpeTrain _),
    "q_bpe_encode" -> (bpeEncode _),
    "q_readability" -> (readability _))

  def oracles: Map[String, String] = Map(
    "q_shard" -> shardChunksSql,
    "q_pipeline_e2e" -> pipelineE2eSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_chunk_overlap" -> chunkOverlapSql,
    "q_dedup_incremental" -> incrementalDedupSql,
    "q_cluster_rep" -> clusterRepresentativesSql,
    "q_source_sim" -> sourceSimilaritySql,
    "q_interleave" -> interleaveSql,
    "q_bpe_pairs" -> bpePairsSql,
    "q_readability" -> readabilitySql)
}
