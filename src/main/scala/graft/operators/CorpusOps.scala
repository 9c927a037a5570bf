package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality / safety operators — the filtering-and-mixing half of a
  * large-scale training-data pipeline, next to the dedup suite. The
  * reference stops at embedding (`embed/embed.go`); these are the
  * north-star extensions a 100 TB corpus run needs before any token is
  * trained on. All four are oracle-checked.
  *
  * Scale shapes: repetition and PII are map-side-plus-one-doc-keyed-shuffle
  * projections; decontamination broadcasts the (small) benchmark gram set;
  * source mixing is a pure map-side hash filter — no RNG, so re-runs and
  * the oracle agree bit-for-bit.
  */
object CorpusOps {

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "555-[0-9]{4}"

  /** Q-repetition: Gopher-style repetition filters — duplicate-token
    * fraction and the fraction of all word-2-grams taken by the most
    * frequent one. High values flag boilerplate/low-quality docs. One
    * shuffle on doc_id (the bigram count re-aggregation); token stats are
    * computed array-side in the same pass. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val tokStats = toks.select(col("doc_id"),
      size(col("t")).as("n_tokens"),
      size(array_distinct(col("t"))).as("n_distinct"))
    // bigram STREAM via the native non-distinct shingle expression — the
    // zip_with/slice lambda form computed the same values interpreted,
    // one boxed call per token (the round-1 HOF lesson)
    val bigrams = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.ngramStream(col("text"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bigrams"))
    tokStats.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double"), 6)
          .as("dup_token_frac"),
        when(col("n_bigrams") > 0,
          round(col("top_c").cast("double") / col("n_bigrams").cast("double"), 6))
          .as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  val repetitionSql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |              FROM documents),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
      |                             i -> t[i] || ' ' || t[i+1])) AS bg
      |       FROM toks),
      |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |bgs AS (SELECT doc_id, MAX(c) AS top_c, CAST(SUM(c) AS BIGINT) AS n_bigrams
      |        FROM bgc GROUP BY 1)
      |SELECT t.doc_id, len(t.t) AS n_tokens,
      |  ROUND(1.0 - CAST(len(list_distinct(t.t)) AS DOUBLE) / len(t.t), 6) AS dup_token_frac,
      |  CASE WHEN bgs.n_bigrams > 0
      |       THEN ROUND(CAST(bgs.top_c AS DOUBLE) / bgs.n_bigrams, 6) END AS top_bigram_frac
      |FROM toks t LEFT JOIN bgs ON t.doc_id = bgs.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Q-decontaminate: train/test decontamination — flag training docs
    * sharing ≥1 word-3-gram shingle with the benchmark split (here the
    * deterministic doc_id % 97 = 0 subset standing in for an eval set).
    * The benchmark gram set is tiny relative to the corpus and is
    * BROADCAST; the corpus side stays map-side (explode + hash semi-join),
    * so at 100 TB this is one pass over training text with no
    * corpus-sized shuffle. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val grams = docs.select(col("doc_id"),
      explode(Dedup.shingles3(col("text"))).as("gram"))
    val benchGrams = grams.filter(col("doc_id") % 97 === 0)
      .select(col("gram")).distinct()
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
      .orderBy(col("doc_id"))
  }

  /** Q-decontaminate-bloom: the SAME benchmark-overlap computation as
    * q_decontaminate, with a BLOOM-FILTER pre-join — the 100 TB shape.
    * The benchmark grams aggregate into Spark's native bloom sketch
    * (`BloomFilterAggregate`, the same structure the engine's own runtime
    * row-level filtering injects), which collects as O(bits) planner
    * metadata (~180 KB at 100k items); `might_contain` then thins the
    * corpus-sized gram stream MAP-SIDE before any join or aggregation.
    * False positives are removed by the exact semi-join that follows, so
    * the result is IDENTICAL to q_decontaminate — same oracle — while the
    * rows that pay the join and the countDistinct shuffle drop from
    * "every gram in the corpus" to "grams that (probably) hit the
    * benchmark". At real scale the bench-gram set outgrows a string
    * broadcast and the verify becomes a shuffle semi-join — whose left
    * side this bloom has already thinned; that ordering (sketch filter →
    * exact verify) is the standard decontamination-at-scale pipeline. */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    val docs = Tables.documents(spark, dir)
    val grams = docs.select(col("doc_id"),
      explode(Dedup.shingles3(col("text"))).as("gram"))
    // materialize ONCE: both the sketch collect and the verify semi-join
    // consume this frame (the GraphOps.affinity discipline)
    val benchGrams = grams.filter(col("doc_id") % 97 === 0)
      .select(col("gram")).distinct().localCheckpoint(true)
    val bloomBytes = benchGrams
      .select(toCol(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          toExpr(xxhash64(col("gram"))), 100000L).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpusGrams = grams.filter(col("doc_id") % 97 =!= 0)
    // an empty benchmark aggregates to a null sketch — fall through to the
    // exact path rather than filtering on might_contain(null) (all-null)
    val prefiltered =
      if (bloomBytes == null) corpusGrams
      else corpusGrams.filter(toCol(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          toExpr(lit(bloomBytes)), toExpr(xxhash64(col("gram"))))))
    prefiltered
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
      .orderBy(col("doc_id"))
  }

  val decontaminateSql: String =
    """WITH toks AS (SELECT doc_id, trim(text) AS tt,
      |                regexp_split_to_array(trim(text), '\s+') AS t
      |         FROM documents),
      |sh AS (SELECT doc_id,
      |         CASE WHEN len(t) >= 3
      |           THEN list_distinct(list_transform(range(1, len(t)-1),
      |                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |           ELSE [tt] END AS grams
      |       FROM toks),
      |ex AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
      |bench AS (SELECT DISTINCT gram FROM ex WHERE doc_id % 97 = 0)
      |SELECT doc_id, COUNT(DISTINCT gram) AS n_shared_grams
      |FROM ex
      |WHERE doc_id % 97 <> 0 AND gram IN (SELECT gram FROM bench)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Q-pii-redact: regex PII redaction (emails, phone extensions) over a
    * corpus with deterministically planted PII — pure map-side projection,
    * the per-document safety pass of a corpus pipeline. Counts come from
    * the SAME regexes that redact, so counts and redacted text can't
    * drift apart. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    Tables.documents(spark, dir)
      .withColumn("line", planted)
      .select(col("doc_id"),
        size(regexp_extract_all(col("line"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("line"), lit(phoneRe), lit(0))).as("n_phones"),
        substring(
          regexp_replace(regexp_replace(col("line"), emailRe, "[EMAIL]"),
            phoneRe, "[PHONE]"), 1, 80).as("redacted_head"))
      .orderBy(col("doc_id"))
  }

  val piiRedactSql: String = {
    val line = """text
      | || CASE WHEN doc_id % 7 = 0
      |      THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
      | || CASE WHEN doc_id % 11 = 0
      |      THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END""".stripMargin.replace("\n", "")
    s"""WITH lines AS (SELECT doc_id, $line AS line FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(line, '$emailRe')) AS n_emails,
       |  len(regexp_extract_all(line, '$phoneRe')) AS n_phones,
       |  substr(regexp_replace(regexp_replace(line, '$emailRe', '[EMAIL]', 'g'),
       |                        '$phoneRe', '[PHONE]', 'g'), 1, 80) AS redacted_head
       |FROM lines ORDER BY doc_id""".stripMargin
  }

  /** Q-mix-sources: deterministic weighted source mixing — the corpus
    * composition step of a training run. Each source gets a sampling rate
    * from its index (mod-4 tier: 90/60/30/10%); a doc is kept iff
    * hash48(doc_id:source) mod 100 falls under the rate. Hash-based (no
    * RNG): re-runs, retries, and the oracle all select the identical
    * subset — the property `sample()` cannot give. Map-side only. */
  def mixSources(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val weight = element_at(array(lit(90), lit(60), lit(30), lit(10)),
      pmod(srcNum, lit(4)) + 1)
    val kept = pmod(Dedup.hash48(concat(col("doc_id"), lit(":"), col("source"))),
      lit(100L)) < weight
    Tables.documents(spark, dir)
      .withColumn("w", weight)
      .withColumn("kept", kept.cast("int"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
      .orderBy(col("source"))
  }

  val mixSourcesSql: String =
    """WITH d AS (SELECT *,
      |    ([90, 60, 30, 10])[(CAST(substr(source, 4) AS INT) % 4) + 1] AS w,
      |    CASE WHEN CAST('0x' || substr(md5(doc_id || ':' || source), 1, 12) AS BIGINT)
      |              % 100 < ([90, 60, 30, 10])[(CAST(substr(source, 4) AS INT) % 4) + 1]
      |         THEN 1 ELSE 0 END AS kept
      |  FROM documents)
      |SELECT source, w, COUNT(*) AS n_total, CAST(SUM(kept) AS BIGINT) AS n_kept
      |FROM d GROUP BY source, w ORDER BY source""".stripMargin

  /** Q-split: deterministic train/val/test assignment (80/10/10) by
    * md5-prefix hash of the doc id — the standard leakage-safe ML split:
    * membership is a pure function of the id, so it is stable under
    * corpus growth, re-runs, and repartitioning (a `sample()`/RNG split
    * is none of these). Map-side projection + one tiny 3-group
    * aggregation; the salt literal keeps this split independent of every
    * other hash-gated decision ([[mixSources]]' keep gate). */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = pmod(Dedup.hash48(concat(col("doc_id"), lit(":split"))), lit(100L))
    val bucket = when(h < 80, "train").when(h < 90, "val").otherwise("test")
    Tables.documents(spark, dir)
      .withColumn("split", bucket)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("split"))
  }

  val trainValTestSplitSql: String =
    """WITH d AS (SELECT *,
      |    CAST('0x' || substr(md5(doc_id || ':split'), 1, 12) AS BIGINT) % 100 AS h
      |  FROM documents)
      |SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  COUNT(DISTINCT source) AS n_sources
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  /** Docs kept per source by [[sourceCap]] — a domain constant. */
  val SourceCap = 50

  /** Q-source-cap: per-source document cap — keep each source's top
    * [[SourceCap]] docs by length (doc_id tiebreak), the anti-domination
    * guard of web-scale corpora (one crawl domain must not swamp the
    * mixture). One shuffle on the source key; rank-truncation inside each
    * partition is Spark's WindowGroupLimit pushdown (`rk <= cap` prunes
    * before the full sort materializes), the same shape the kNN join
    * uses. Reported per source: kept count, kept chars, and the length
    * threshold that made the cut. */
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SourceCap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).cast("long").as("kept_chars"),
        min(col("n_chars")).as("min_chars_kept"))
      .orderBy(col("source"))
  }

  val sourceCapSql: String =
    s"""WITH ranked AS (SELECT source, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_kept,
       |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
       |  MIN(n_chars) AS min_chars_kept
       |FROM ranked WHERE rk <= $SourceCap
       |GROUP BY source ORDER BY source""".stripMargin

  /** Stopword probe set for the Gopher stop-word rule (the testdata vocab
    * contains 'the' and 'a'; 'and'/'of' exercise the absent case). */
  private[operators] val GopherStops = Seq("the", "a", "and", "of")

  /** The stop-word-count SQL fragment shared by every oracle that embeds
    * the Gopher gate (gopherRulesSql, pipelineE2eSql) — one list, one
    * fragment, so the gate can never drift between oracles. */
  private[operators] def gopherStopSumSql: String = GopherStops
    .map(w => s"CAST(list_contains(t, '$w') AS INT)").mkString(" + ")

  /** Q-gopher-rules: Gopher-style composite quality-rule filter — each doc
    * gets a per-rule verdict (word-count bounds, mean-word-length bounds,
    * ≥2 distinct stopwords present, duplicate-token fraction ≤ 0.5) plus
    * the conjunction `keep`. Shipping the per-rule flags, not just the
    * conjunction, is the point: at corpus scale the follow-up question is
    * always "WHICH rule is rejecting my documents" (aggregate the flags),
    * and re-running one rule over 100 TB to find out is the anti-pattern.
    * Pure map-side projection — every metric derives from the doc's own
    * token array; rule flags are 0/1 ints so both engines hash the same
    * column class. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherFlags(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_words"), col("mean_wl"), col("dup_frac"),
        col("n_stop"), col("pass_nwords"), col("pass_mwl"), col("pass_stop"),
        col("pass_dup"), col("keep"))
      .orderBy(col("doc_id"))

  /** The rule core of [[gopherRules]] over an arbitrary documents frame
    * (needs a `text` column; every input column rides through) — so the
    * gate composes mid-pipeline (q_pipeline_e2e) instead of only over the
    * raw table. */
  def gopherFlags(docs: DataFrame): DataFrame = {
    val stops = GopherStops.map(w => array_contains(col("t"), w).cast("int"))
    docs
      .withColumn("t", split(trim(col("text")), "\\s+"))
      .withColumn("n_words",
        when(length(trim(col("text"))) === 0, lit(0L))
          .otherwise(size(col("t")).cast("long")))
      .withColumn("mean_wl",
        when(col("n_words") > 0, round(
          expr("aggregate(transform(t, x -> CAST(length(x) AS BIGINT)), 0L, (s, x) -> s + x)")
            .cast("double") / col("n_words"), 6)))
      .withColumn("dup_frac",
        when(col("n_words") > 0, round(
          lit(1.0) - size(array_distinct(col("t"))).cast("double") / col("n_words"), 6)))
      .withColumn("n_stop", stops.reduce(_ + _))
      .withColumn("pass_nwords",
        (col("n_words") >= 10 && col("n_words") <= 1000).cast("int"))
      .withColumn("pass_mwl",
        (col("mean_wl").isNotNull && col("mean_wl") >= 2.0 && col("mean_wl") <= 12.0).cast("int"))
      .withColumn("pass_stop", (col("n_stop") >= 2).cast("int"))
      .withColumn("pass_dup",
        (col("dup_frac").isNotNull && col("dup_frac") <= 0.5).cast("int"))
      .withColumn("keep",
        (col("pass_nwords") === 1 && col("pass_mwl") === 1 &&
          col("pass_stop") === 1 && col("pass_dup") === 1).cast("int"))
      .drop("t")
  }

  val gopherRulesSql: String = {
    val stopSum = gopherStopSumSql
    s"""WITH toks AS (SELECT doc_id,
       |    regexp_split_to_array(trim(text), '\\s+') AS t,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_words
       |  FROM documents),
       |m AS (SELECT doc_id, n_words,
       |    CASE WHEN n_words > 0 THEN ROUND(
       |      CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE)
       |        / n_words, 6) END AS mean_wl,
       |    CASE WHEN n_words > 0 THEN ROUND(
       |      1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / n_words, 6) END AS dup_frac,
       |    $stopSum AS n_stop
       |  FROM toks)
       |SELECT doc_id, n_words, mean_wl, dup_frac, n_stop,
       |  CAST(n_words >= 10 AND n_words <= 1000 AS INT) AS pass_nwords,
       |  CAST(mean_wl IS NOT NULL AND mean_wl >= 2.0 AND mean_wl <= 12.0 AS INT) AS pass_mwl,
       |  CAST(n_stop >= 2 AS INT) AS pass_stop,
       |  CAST(dup_frac IS NOT NULL AND dup_frac <= 0.5 AS INT) AS pass_dup,
       |  CAST(n_words >= 10 AND n_words <= 1000
       |    AND mean_wl IS NOT NULL AND mean_wl >= 2.0 AND mean_wl <= 12.0
       |    AND n_stop >= 2
       |    AND dup_frac IS NOT NULL AND dup_frac <= 0.5 AS INT) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Quantile for the per-source quality floor (q_quality_gate). */
  val GateQuantile = 0.25

  /** Q-quality-gate: per-source exact-percentile quality thresholding —
    * each source keeps only docs at or above its own P25 of the quality
    * score (here `n_chars`, the pluggable stand-in for any per-doc score —
    * classifier logit, perplexity, entropy). Per-source thresholds, not a
    * global one, are the production shape: sources have wildly different
    * score distributions and one global floor empties the clean-but-short
    * source. The threshold frame is one row per source — it BROADCASTS,
    * so the gate itself is a map-side filter; the only shuffle is the
    * percentile aggregation (exact interpolated percentile, the same
    * kernel parity q_percentiles proves). */
  def qualityGate(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars").cast("double").as("score"))
    val thresholds = scored.groupBy(col("source"))
      .agg(expr(s"percentile(score, $GateQuantile)").as("thr"))
    scored.join(broadcast(thresholds), Seq("source"))
      .groupBy(col("source"), col("thr"))
      .agg(
        sum(when(col("score") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("score") < col("thr"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("source"), round(col("thr"), 6).as("thr"),
        col("n_kept"), col("n_dropped"))
      .orderBy(col("source"))
  }

  val qualityGateSql: String =
    s"""WITH scored AS (SELECT source, CAST(n_chars AS DOUBLE) AS score FROM documents),
       |thr AS (SELECT source, quantile_cont(score, $GateQuantile) AS thr
       |        FROM scored GROUP BY source)
       |SELECT scored.source, ROUND(thr, 6) AS thr,
       |  CAST(SUM(CASE WHEN score >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN score < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
       |FROM scored JOIN thr USING (source)
       |GROUP BY scored.source, thr ORDER BY scored.source""".stripMargin

  /** Temperature exponent: effective mixture ∝ n^TempAlpha (T = 1/α). */
  val TempAlpha = 0.5

  /** Q-temperature-mix: temperature-flattened language rebalancing — the
    * multilingual-LLM mixing step (sampling share ∝ size^α). Keep-rate
    * per language is `min(1, (n_min/n_l)^(1-α))`: the smallest language
    * keeps everything, dominant ones are downsampled toward the flattened
    * share. Normalizing by the group MIN (an exact integer) instead of
    * the softmax denominator is deliberate: a Σ n^α across groups sums
    * doubles in engine-dependent order, while `sqrt` and one division of
    * exact ints are correctly-rounded IEEE on both engines — the gate
    * literal `floor(rate·10⁶)` is therefore bit-identical to the oracle.
    * Membership is a salted portable-hash gate (same leakage-safe
    * determinism as [[trainValTestSplit]]): stable under re-runs,
    * repartitioning, and corpus appends. The rates frame is one row per
    * language — broadcast; the whole gate is map-side. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureRebalance(Tables.documents(spark, dir),
      keyCol = "lang", idCol = "doc_id", salt = ":temp", countName = "n_docs")

  /** THE temperature-rebalancing gate, shared by every mixing surface
    * (q_temperature_mix over the labeled `lang` column; q_cluster_mix
    * over unsupervised centroid assignments): per-key keep-rate
    * `min(1, sqrt(n_min/n_key))`, `floor(rate·10⁶)` gate literal, salted
    * portable-hash membership. ONE definition (and one SQL twin below)
    * because oracle hash-parity depends on this arithmetic staying
    * bit-identical everywhere it appears — a guard or rounding fix must
    * reach all mixing queries through here. */
  private[operators] def temperatureRebalance(assigned: DataFrame, keyCol: String,
      idCol: String, salt: String, countName: String): DataFrame = {
    val sizes = assigned.groupBy(col(keyCol)).agg(count(lit(1)).as(countName))
    val minN = sizes.agg(min(col(countName)).as("n_min"))
    val rates = sizes.crossJoin(broadcast(minN))
      // α = 0.5 → the exponent is exactly 1/2: use sqrt, which IEEE
      // guarantees correctly rounded on both engines — pow(x, 0.5) is not
      .withColumn("rate", least(lit(1.0),
        sqrt(col("n_min").cast("double") / col(countName))))
      .withColumn("gate", floor(col("rate") * lit(1000000.0)).cast("long"))
    assigned.join(broadcast(rates), Seq(keyCol))
      .withColumn("kept",
        (pmod(Dedup.hash48(concat(col(idCol), lit(salt))),
          lit(1000000L)) < col("gate")).cast("int"))
      .groupBy(col(keyCol), col(countName), col("rate"))
      .agg(sum(col("kept")).as("n_kept"))
      .select(col(keyCol), col(countName), round(col("rate"), 6).as("rate"),
        col("n_kept"))
      .orderBy(col(keyCol))
  }

  /** SQL twin of [[temperatureRebalance]]: `prefixCte` supplies any CTEs
    * the source frame needs (ending with a trailing comma) and `from`
    * names the frame carrying (idCol, keyCol). */
  private[operators] def temperatureRebalanceSql(prefixCte: String, from: String,
      key: String, id: String, salt: String, countName: String): String =
    s"""WITH ${prefixCte}sizes AS (SELECT $key, COUNT(*) AS $countName FROM $from GROUP BY $key),
       |mn AS (SELECT MIN($countName) AS n_min FROM sizes),
       |rates AS (SELECT $key, $countName,
       |    LEAST(1.0, sqrt(CAST(n_min AS DOUBLE) / $countName)) AS rate
       |  FROM sizes, mn),
       |d AS (SELECT $from.$key, $countName, rate,
       |    CASE WHEN CAST('0x' || substr(md5($from.$id || '$salt'), 1, 12) AS BIGINT)
       |              % 1000000 < CAST(FLOOR(rate * 1000000.0) AS BIGINT)
       |         THEN 1 ELSE 0 END AS kept
       |  FROM $from JOIN rates USING ($key))
       |SELECT $key, $countName, ROUND(rate, 6) AS rate,
       |  CAST(SUM(kept) AS BIGINT) AS n_kept
       |FROM d GROUP BY $key, $countName, rate ORDER BY $key""".stripMargin

  val temperatureMixSql: String = temperatureRebalanceSql(
    prefixCte = "", from = "documents",
    key = "lang", id = "doc_id", salt = ":temp", countName = "n_docs")

  /** Group-size floor for [[kAnonymity]]. */
  val AnonK = 8

  /** Q-k-anonymity: k-anonymous release of the corpus's quasi-identifier
    * frame — the structural privacy gate beside q_pii_redact's textual
    * one (redaction scrubs values; k-anonymity prevents the METADATA
    * combination itself from isolating fewer than k records). Standard
    * generalization ladder over the (lang, source) quasi-identifiers:
    * groups of ≥ k release as-is; smaller groups generalize source → '*'
    * and release if the lang-level regroup reaches k; the remainder is
    * fully suppressed under ('*','*'). Emitted as (lang, source, n_docs)
    * release-table stats.
    *
    * Scale shape: ONE corpus-sized count aggregation; the ladder then
    * operates on the group frame (quasi-identifier-cardinality rows, not
    * corpus rows) — two more tiny aggs and a three-way union of frames
    * that never touch the data again. Suppression-branch semantics are
    * spec-pinned on a planted small-group frame ([[kAnonymize]]);
    * at gate scale the data exercises release + generalization. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    kAnonymize(Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n")), AnonK)

  /** The ladder core over a precomputed (lang, source, n) group frame. */
  def kAnonymize(groups: DataFrame, k: Int): DataFrame = {
    val rel0 = groups.filter(col("n") >= k)
      .select(col("lang"), col("source"), col("n"))
    val rest = groups.filter(col("n") < k)
      .groupBy(col("lang")).agg(sum(col("n")).as("n"))
    val rel1 = rest.filter(col("n") >= k)
      .select(col("lang"), lit("*").as("source"), col("n"))
    val sup = rest.filter(col("n") < k)
      .agg(sum(col("n")).as("n"))
      .filter(col("n").isNotNull)
      .select(lit("*").as("lang"), lit("*").as("source"), col("n"))
    rel0.unionByName(rel1).unionByName(sup)
      .select(col("lang"), col("source"), col("n").as("n_docs"))
      .orderBy(col("lang"), col("source"))
  }

  val kAnonymitySql: String =
    s"""WITH g AS (SELECT lang, source, COUNT(*) AS n
       |  FROM documents GROUP BY 1, 2),
       |rel0 AS (SELECT lang, source, n FROM g WHERE n >= $AnonK),
       |rest AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n FROM g
       |  WHERE n < $AnonK GROUP BY lang),
       |rel1 AS (SELECT lang, '*' AS source, n FROM rest WHERE n >= $AnonK),
       |sup AS (SELECT '*' AS lang, '*' AS source, CAST(SUM(n) AS BIGINT) AS n
       |  FROM rest WHERE n < $AnonK HAVING SUM(n) IS NOT NULL)
       |SELECT lang, source, n AS n_docs FROM
       |  (SELECT * FROM rel0 UNION ALL SELECT * FROM rel1 UNION ALL SELECT * FROM sup)
       |ORDER BY lang, source""".stripMargin

  /** Restricted feature vocabulary for [[dsir]] — the hashed-feature-space
    * bound of the published method, realized as the top-V corpus words
    * (deterministic: global count desc, word asc) so the oracle can
    * replay vocabulary selection exactly (an engine-specific string hash
    * would diverge between Spark and DuckDB). V is metadata-sized:
    * the vocabulary and its two probability rows broadcast. */
  val DsirVocabSize = 256
  /** Docs kept by the importance resample. */
  val DsirKeep = 20

  /** Q-dsir: IMPORTANCE-WEIGHTED DATA SELECTION — the DSIR recipe (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every raw document by how much more likely its
    * bag of features is under a TARGET distribution than under the raw
    * corpus, then keep the top-weighted docs. Here the target is the
    * English slice (the "domain corpus" stand-in), features are
    * [[DsirVocabSize]]-vocab unigrams with add-one smoothing, and the
    * per-doc log-importance weight is
    *
    *   w(d) = Σ_{t ∈ vocab} c(t, d) · ln( p̂_target(t) / p̂_raw(t) )
    *
    * Per-doc sums are EXACT-DECIMAL (each term cast to DECIMAL(38,20) —
    * the q_pagerank order-free-sum discipline), so partial aggregation is
    * map-side and the oracle matches bit-for-bit under any partitioning.
    * Docs with zero vocabulary overlap weight 0 exactly (left join +
    * coalesce on BOTH sides, not absence).
    *
    * Scale shape: one tokenize-explode + one (doc, term) count shuffle —
    * shared cost with every other bag-of-words query; the vocabulary and
    * both smoothed distributions are V-row metadata (broadcast); the
    * weight is one doc-keyed aggregation. Nothing grows past corpus-linear
    * at 100 TB, and the selection threshold (here top-[[DsirKeep]])
    * becomes a per-shard quantile gate in a production run. */
  def dsir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cwd = docs
      .select(col("doc_id"), col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val byWord = cwd.groupBy(col("w")).agg(
      sum(col("cnt")).as("cr"),
      sum(when(col("lang") === "en", col("cnt")).otherwise(0L)).as("ct"))
    val vocab = byWord.orderBy(col("cr").desc, col("w")).limit(DsirVocabSize)
      .localCheckpoint(eager = true) // feeds totals AND the contribution join
    val totals = vocab.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val weights = cwd
      .join(broadcast(vocab), "w")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (col("cnt") * log(
          ((col("ct") + 1.0) / (col("tt") + DsirVocabSize)) /
            ((col("cr") + 1.0) / (col("tr") + DsirVocabSize))))
          .cast("decimal(38,20)").as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("double").as("s"))
    docs.select(col("doc_id"), col("lang"))
      .join(weights, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        round(coalesce(col("s"), lit(0.0)), 6).as("weight"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(DsirKeep)
  }

  val dsirSql: String =
    s"""WITH toks AS (SELECT doc_id, lang,
       |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |  FROM documents),
       |cwd AS (SELECT doc_id, lang, w, COUNT(*) AS cnt FROM toks GROUP BY 1, 2, 3),
       |byword AS (SELECT w, SUM(cnt) AS cr,
       |    SUM(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS ct
       |  FROM cwd GROUP BY w),
       |vocab AS (SELECT * FROM byword ORDER BY cr DESC, w LIMIT $DsirVocabSize),
       |tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM vocab),
       |contrib AS (SELECT cwd.doc_id,
       |    CAST(cwd.cnt * ln(((v.ct + 1.0) / (tot.tt + $DsirVocabSize))
       |                      / ((v.cr + 1.0) / (tot.tr + $DsirVocabSize)))
       |         AS DECIMAL(38,20)) AS c
       |  FROM cwd JOIN vocab v USING (w) CROSS JOIN tot),
       |wsum AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS s FROM contrib GROUP BY doc_id)
       |SELECT d.doc_id, d.lang, ROUND(COALESCE(w.s, 0.0), 6) AS weight
       |FROM documents d LEFT JOIN wsum w ON w.doc_id = d.doc_id
       |ORDER BY weight DESC, d.doc_id LIMIT $DsirKeep""".stripMargin

  /** Fixed epoch count for q_quality_train — a constant (not
    * convergence-tested) so the oracle can replay the exact training run
    * as chained CTEs, the [[GraphOps.PagerankIters]] discipline. */
  val PerceptronEpochs = 5

  /** Integer document features for the classifier, CENTERED by fixed
    * constants (≈ the corpus means — centering is the one preprocessing
    * step a lr=1 integer perceptron needs: uncentered length-scale
    * features force the bias to chase w₁·mean every epoch and the batch
    * updates oscillate; measured on this corpus the uncentered run
    * bounces 500→245→255→… while the centered run converges 500→23→…→17).
    * All derivations are chosen for EXACT cross-engine parity — a column
    * the parquet already stores, the established tokenCount split, and a
    * length-difference character count (engine length conventions cancel
    * in the difference).
    *
    * The training TARGET is the q_gopher_rules-style length gate
    * (`n_chars > 300`) rather than a categorical column: the synthetic
    * corpus's lang/source labels are statistically INDEPENDENT of its
    * text (measured: per-language means of every text statistic agree to
    * three digits — nothing any feature set could learn), so the honest
    * demo is RULE DISTILLATION — train the linear model to imitate a
    * deterministic gate from correlated-but-noisy features, the standard
    * trick for replacing a brittle rule stack with a scoreable model.
    * Swapping the label column for human quality bits is the production
    * use; the distributed mechanics are identical. */
  private def perceptronFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      when(col("n_chars") > 300, 1L).otherwise(-1L).as("y"),
      (expr("n_chars DIV 100") - 3L).as("x1"),
      (graft.functions.TextFunctions.tokenCount(col("text")).cast("long") - 55L).as("x2"),
      (expr("length(text) - length(replace(text, 'e', ''))").cast("long") - 33L).as("x3"))

  /** The same feature derivations in DuckDB — the `//` floor division and
    * regexp split mirror the Spark fragments above term for term. */
  private val perceptronFeaturesSql: String =
    """SELECT CASE WHEN n_chars > 300 THEN 1 ELSE -1 END AS y,
      |  n_chars // 100 - 3 AS x1,
      |  (CASE WHEN length(trim(text)) = 0 THEN 0
      |        ELSE len(regexp_split_to_array(trim(text), '\s+')) END) - 55 AS x2,
      |  length(text) - length(replace(text, 'e', '')) - 33 AS x3
      |FROM documents""".stripMargin

  /** Q-quality-train: DISTRIBUTED CLASSIFIER TRAINING — a batch
    * perceptron distilling the length gate from three centered integer
    * features (see [[perceptronFeatures]] for why distillation is the
    * honest target on this corpus). Per epoch: one distributed
    * aggregation computes the misclassified count and the summed gradient
    * Σ y·x over rows with margin y·(w·x) ≤ 0, then the driver adds the
    * delta into the weight vector — the canonical full-batch training
    * loop (compute gradient on the cluster, update parameters on the
    * driver, broadcast them back as literals in the next epoch's
    * predicate). The declared n_mis column shows the convergence
    * (500 → 23 → 23 → 21 → 17 at sf0.01).
    *
    * EXACT: every feature, margin, and update is 64-bit integer
    * arithmetic with learning rate 1, so the whole training run is
    * bit-replayable — the oracle unrolls the epochs as chained
    * ungrouped aggregates (one row even when nothing is misclassified)
    * over the identical feature CTE. No FP enters until the final
    * accuracy ratio.
    *
    * Scale shape: an epoch is one scan + one partial-aggregated global
    * sum (5 longs cross the driver); the model is 4 longs. Epochs
    * serialize, everything inside an epoch is embarrassingly parallel —
    * exactly how distributed LR/perceptron baselines run on clusters. */
  /** The training loop shared by q_quality_train (reports the epoch
    * table) and q_quality_apply (takes the final weights to inference):
    * returns the per-epoch (epoch, n_mis, w₀..w₃) rows; the last row
    * carries the final model. */
  /** Memo for [[perceptronEpochs]] keyed by dataset dir: training is
    * deterministic (integer arithmetic, fixed epochs), so a session
    * running both q_quality_train and q_quality_apply — or either twice —
    * pays the 5 distributed epoch jobs once, not per caller. The values
    * are 6-tuples of longs (epoch rows), never row data — driver-bounded
    * by construction. */
  private val epochCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Long, Long, Long, Long, Long, Long)]]

  private def perceptronEpochs(spark: SparkSession, dir: String)
      : Seq[(Long, Long, Long, Long, Long, Long)] =
    epochCache.getOrElseUpdate(dir, computePerceptronEpochs(spark, dir))

  private def computePerceptronEpochs(spark: SparkSession, dir: String)
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val feats = perceptronFeatures(spark, dir).localCheckpoint(true)
    var w = Array(0L, 0L, 0L, 0L)
    (1 to PerceptronEpochs).map { epoch =>
      val margin = col("y") *
        (lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))
      val r = feats.filter(margin <= 0).agg(
        count(lit(1)).as("n_mis"),
        coalesce(sum(col("y")), lit(0L)).as("d0"),
        coalesce(sum(col("y") * col("x1")), lit(0L)).as("d1"),
        coalesce(sum(col("y") * col("x2")), lit(0L)).as("d2"),
        coalesce(sum(col("y") * col("x3")), lit(0L)).as("d3")).head()
      w = Array(w(0) + r.getLong(1), w(1) + r.getLong(2),
        w(2) + r.getLong(3), w(3) + r.getLong(4))
      (epoch.toLong, r.getLong(0), w(0), w(1), w(2), w(3))
    }
  }

  def qualityTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    perceptronEpochs(spark, dir)
      .toDF("epoch", "n_mis", "w0", "w1", "w2", "w3").orderBy(col("epoch"))
  }

  /** Q-quality-apply: INFERENCE with the trained model — the final-epoch
    * weights broadcast back over the corpus as literals (the standard
    * train-then-score deployment: the model is O(dims) driver metadata,
    * scoring is one embarrassingly-parallel scan), reported as the
    * confusion matrix + accuracy against the training labels. Prediction
    * is `sign(w·x)` with 0 → negative (the same boundary the training
    * margin used). Exact end-to-end: training and inference are both
    * integer, so the oracle replays the full train→apply pipeline as one
    * CTE chain. */
  def qualityApply(spark: SparkSession, dir: String): DataFrame = {
    val last = perceptronEpochs(spark, dir).last
    val (w0, w1, w2, w3) = (last._3, last._4, last._5, last._6)
    val score = lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2") + lit(w3) * col("x3")
    val pred = when(score > 0, 1L).otherwise(-1L)
    perceptronFeatures(spark, dir)
      .select(col("y"), pred.as("pred"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("y") === 1 && col("pred") === 1, 1L)), lit(0L)).as("tp"),
        coalesce(sum(when(col("y") === -1 && col("pred") === 1, 1L)), lit(0L)).as("fp"),
        coalesce(sum(when(col("y") === -1 && col("pred") === -1, 1L)), lit(0L)).as("tn"),
        coalesce(sum(when(col("y") === 1 && col("pred") === -1, 1L)), lit(0L)).as("fn"))
      .select(col("n"), col("tp"), col("fp"), col("tn"), col("fn"),
        round((col("tp") + col("tn")).cast("double") / col("n"), 6).as("accuracy"))
  }

  /** ONE builder for the chained epoch CTEs (`e1..eN`, N =
    * [[PerceptronEpochs]]) shared by BOTH perceptron oracles — a fix to
    * the update arithmetic or epoch count can never reach one oracle and
    * miss the other.
    *
    * Each epoch references its predecessor exactly ONCE (a CROSS JOIN of
    * the single weight row) with the margin as an aggregate FILTER — the
    * first formulation used four scalar subqueries per epoch, which an
    * inlining planner expands to 4^N evaluations of the chain (measured:
    * the 3-epoch form answered in ms, the 5-epoch form did not return).
    * FILTER instead of WHERE also keeps the one-row-even-if-converged
    * contract without GROUP BY's empty-input pitfall: f is never empty,
    * so the group always exists. */
  private def perceptronEpochCtes: String = {
    def epochCte(i: Int): String = {
      def pw(j: Int) = if (i == 1) "0" else s"p.w$j"
      val from = if (i == 1) "f" else s"f CROSS JOIN e${i - 1} p"
      val grp = if (i == 1) "" else "\n  GROUP BY p.w0, p.w1, p.w2, p.w3"
      val mis = s"y * (${pw(0)} + ${pw(1)} * x1 + ${pw(2)} * x2 + ${pw(3)} * x3) <= 0"
      s"""e$i AS (
         |  SELECT CAST(COUNT(*) FILTER (WHERE $mis) AS BIGINT) AS n_mis,
         |    ${pw(0)} + CAST(COALESCE(SUM(y) FILTER (WHERE $mis), 0) AS BIGINT) AS w0,
         |    ${pw(1)} + CAST(COALESCE(SUM(y * x1) FILTER (WHERE $mis), 0) AS BIGINT) AS w1,
         |    ${pw(2)} + CAST(COALESCE(SUM(y * x2) FILTER (WHERE $mis), 0) AS BIGINT) AS w2,
         |    ${pw(3)} + CAST(COALESCE(SUM(y * x3) FILTER (WHERE $mis), 0) AS BIGINT) AS w3
         |  FROM $from$grp)""".stripMargin
    }
    (1 to PerceptronEpochs).map(epochCte).mkString(",\n")
  }

  val qualityApplySql: String = {
    val last = s"e$PerceptronEpochs"
    s"""WITH f AS ($perceptronFeaturesSql),
       |$perceptronEpochCtes,
       |scored AS (
       |  SELECT y, CASE WHEN p.w0 + p.w1 * x1 + p.w2 * x2 + p.w3 * x3 > 0
       |            THEN 1 ELSE -1 END AS pred
       |  FROM f CROSS JOIN $last p)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(COALESCE(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 END), 0) AS BIGINT) AS tp,
       |  CAST(COALESCE(SUM(CASE WHEN y = -1 AND pred = 1 THEN 1 END), 0) AS BIGINT) AS fp,
       |  CAST(COALESCE(SUM(CASE WHEN y = -1 AND pred = -1 THEN 1 END), 0) AS BIGINT) AS tn,
       |  CAST(COALESCE(SUM(CASE WHEN y = 1 AND pred = -1 THEN 1 END), 0) AS BIGINT) AS fn,
       |  ROUND(CAST(COALESCE(SUM(CASE WHEN y = pred THEN 1 END), 0) AS DOUBLE) / COUNT(*), 6) AS accuracy
       |FROM scored""".stripMargin
  }

  val qualityTrainSql: String = {
    val rows = (1 to PerceptronEpochs)
      .map(i => s"SELECT $i AS epoch, n_mis, w0, w1, w2, w3 FROM e$i")
      .mkString("\n|UNION ALL ")
    s"""WITH f AS ($perceptronFeaturesSql),
       |$perceptronEpochCtes
       |$rows
       |ORDER BY epoch""".stripMargin
  }

  /** Sample size for q_weighted_sample. */
  val WeightedSampleN = 100

  /** Q-weighted-sample: WEIGHTED SAMPLING WITHOUT REPLACEMENT
    * (Efraimidis–Spirakis 2006) — the sampling-family member the suite
    * was missing: q_stratified_sample is per-class systematic, q_split
    * and q_mix_sources are hash gates, DSIR reweights; this DRAWS a
    * fixed-size sample where inclusion probability follows a per-doc
    * quality weight. Each doc gets an exponential key `-ln(u)/w` from a
    * deterministic uniform u and its weight w (here chars+1, standing in
    * for any quality score); the N smallest keys ARE a weighted sample
    * without replacement — the one-pass, shuffle-light formulation every
    * distributed system uses (A-ES), and the N-smallest plan is
    * TakeOrderedAndProject, never a corpus sort.
    *
    * Determinism across engines: u comes from an ARITHMETIC LCG step on
    * doc_id (integer multiply/mod both engines compute identically —
    * never an engine hash, which has no cross-engine twin), and ln
    * parity is the established q_perplexity precedent; the declared key
    * is rounded with doc_id as tie-break, so the oracle replays the
    * exact draw. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    // reduce doc_id mod the Mersenne prime BEFORE the multiply: the
    // product then tops out at ~2.4e18 < 2^63 for ANY long id, so the
    // arithmetic never reaches the domain where Spark wraps silently and
    // DuckDB raises — overflow would break the oracle-replay contract
    // exactly where it matters (big corpora)
    val u = (((col("doc_id") % lit(2147483647L)) * lit(1103515245L) + lit(12345L))
      % lit(2147483647L) + lit(1L))
      .cast("double") / lit(2147483648.0)
    val w = (col("n_chars") + lit(1L)).cast("double")
    Tables.documents(spark, dir)
      // a NULL weight makes a NULL key, which Spark sorts FIRST (into
      // the sample) and SQL sorts LAST (out of it) — exclude explicitly
      // on both sides instead of leaving a silent divergence
      .filter(col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars"),
        round(-log(u) / w * lit(1e6), 6).as("skey"))
      .orderBy(col("skey"), col("doc_id"))
      .limit(WeightedSampleN)
  }

  val weightedSampleSql: String =
    s"""SELECT doc_id, n_chars,
       |  ROUND(-ln(CAST(((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647 + 1
       |                 AS DOUBLE)
       |            / 2147483648.0)
       |        / CAST(n_chars + 1 AS DOUBLE) * 1e6, 6) AS skey
       |FROM documents
       |WHERE n_chars IS NOT NULL
       |ORDER BY skey, doc_id LIMIT $WeightedSampleN""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_weighted_sample" -> (weightedSample _),
    "q_quality_train" -> (qualityTrain _),
    "q_quality_apply" -> (qualityApply _),
    "q_dsir" -> (dsir _),
    "q_k_anonymity" -> (kAnonymity _),
    "q_temperature_mix" -> (temperatureMix _),
    "q_repetition" -> (repetition _),
    "q_decontaminate" -> (decontaminate _),
    "q_decontaminate_bloom" -> (decontaminateBloom _),
    "q_pii_redact" -> (piiRedact _),
    "q_mix_sources" -> (mixSources _),
    "q_split" -> (trainValTestSplit _),
    "q_source_cap" -> (sourceCap _),
    "q_gopher_rules" -> (gopherRules _),
    "q_quality_gate" -> (qualityGate _))

  def oracles: Map[String, String] = Map(
    "q_weighted_sample" -> weightedSampleSql,
    "q_quality_train" -> qualityTrainSql,
    "q_quality_apply" -> qualityApplySql,
    "q_dsir" -> dsirSql,
    "q_k_anonymity" -> kAnonymitySql,
    "q_temperature_mix" -> temperatureMixSql,
    "q_repetition" -> repetitionSql,
    "q_decontaminate" -> decontaminateSql,
    "q_decontaminate_bloom" -> decontaminateSql,
    "q_pii_redact" -> piiRedactSql,
    "q_mix_sources" -> mixSourcesSql,
    "q_split" -> trainValTestSplitSql,
    "q_source_cap" -> sourceCapSql,
    "q_gopher_rules" -> gopherRulesSql,
    "q_quality_gate" -> qualityGateSql)
}
