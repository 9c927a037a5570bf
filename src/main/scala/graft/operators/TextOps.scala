package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text ingestion/analysis surface: the reference's chat-line parsing and
  * normalization (`embed/embed.go:30-31`, `embed/embed.go:98-111`) plus the
  * north-star text-analysis operators (token counting, language ID, quality
  * scoring, fingerprinting). All are narrow projections — at 100 TB they
  * run map-side with zero shuffle, and only the columns they touch are read
  * from Parquet (column pruning).
  *
  * The documents table has no chat-formatted lines, so the parse queries
  * synthesize the documented format (`[09.09.23, 14:35:02] ~ sender: text`,
  * reference `main.go:32`) around the corpus text and parse it back — a
  * format→parse round-trip both engines replicate.
  */
object TextOps {

  private val prefixSqlPattern = """^\[[^\]]*\]\s*~?\s*[^:]*:\s*"""

  /** Synthetic chat line in the documented format (`main.go:32`) wrapped
    * around a body column — shared by the parse/fold queries (Scala and
    * SQL sides must construct the identical string). */
  private def chatLine(body: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("[09.09.23, 14:35:02] ~ user_"), col("doc_id"), lit(": "), body)
  private val chatLineSql = "'[09.09.23, 14:35:02] ~ user_' || doc_id || ': '"

  /** Q-parse: strip the chat prefix (intended semantics — the reference's
    * own regex can only ever capture the first token, bug B1). */
  def parse(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("line", chatLine(col("text")))
      .select(
        col("doc_id"),
        substring(chatMessage(col("line")), 1, 60).as("message_head"),
        (chatMessage(col("line")) === col("text")).as("roundtrip_ok"),
        chatSender(col("line")).as("sender"))
      .orderBy(col("doc_id"))

  val parseSql: String =
    s"""SELECT doc_id,
       |  substr(regexp_replace($chatLineSql || text,
       |                        '$prefixSqlPattern', ''), 1, 60) AS message_head,
       |  regexp_replace($chatLineSql || text,
       |                 '$prefixSqlPattern', '') = text AS roundtrip_ok,
       |  regexp_extract($chatLineSql || text,
       |                 '^\\[[^\\]]*\\]\\s*~?\\s*([^:]*):', 1) AS sender
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Q-parse-stats: the reference's per-run counters (`embed/embed.go:63-64`,
    * `130-131`) as an aggregate — lines with/without a parseable prefix.
    * Half the synthesized corpus (odd doc_ids) is left prefix-less. */
  def parseStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("line",
        when(col("doc_id") % 2 === 0, chatLine(col("text"))).otherwise(col("text")))
      .groupBy(hasChatPrefix(col("line")).as("parse_ok"))
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("line")).cast("long")).as("total_chars"))
      .orderBy(col("parse_ok"))

  val parseStatsSql: String =
    s"""WITH lines AS (
       |  SELECT CASE WHEN doc_id % 2 = 0
       |           THEN $chatLineSql || text
       |           ELSE text END AS line
       |  FROM documents)
       |SELECT regexp_matches(line, '$prefixSqlPattern') AS parse_ok,
       |  COUNT(*) AS n_lines, CAST(SUM(length(line)) AS BIGINT) AS total_chars
       |FROM lines GROUP BY 1 ORDER BY parse_ok""".stripMargin

  /** Q-normalize: the reference's pre-embedding cleanup
    * (`embed/embed.go:30-31`): whitespace runs → single space, trim. */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), normalizeText(col("text")).as("norm_text"))
      .orderBy(col("doc_id"))

  val normalizeSql: String =
    """SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm_text
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q-textstats: scalar string-function suite (SURVEY.md §2.8). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_char"),
        tokenCount(col("text")).as("n_tokens"),
        approxBpeCount(col("text")).as("n_bpe"),
        round(punctRatio(col("text")), 6).as("punct_ratio"),
        round(stopwordRatio(col("text")), 6).as("stopword_ratio"))
      .orderBy(col("doc_id"))

  val textStatsSql: String = {
    val stops = stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, length(text) AS n_char,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
       |    + len(regexp_extract_all(text, '[[:punct:]]')) AS n_bpe,
       |  ROUND(len(regexp_extract_all(text, '[[:punct:]]'))
       |    / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
       |  ROUND(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |                        t -> t IN ($stops)))
       |    / CAST(greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) AS DOUBLE), 6)
       |    AS stopword_ratio
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Q-lang-filter: partition-style language routing (reference
    * `main.go:293-302` routes he/en at file granularity; here it is a
    * pushed-down predicate — the Spark analog of reading one partition). */
  def langFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("lang") === "zh")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  val langFilterSql: String =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE lang = 'zh' ORDER BY doc_id""".stripMargin

  /** Q-langid: char-class language-ID heuristic. The synthetic corpus text
    * carries no real language signal (all rows are English word salad), so
    * the interesting parity here is the regex+arithmetic pipeline; the
    * discrimination itself is unit-tested on true multilingual fixtures. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), langIdHeuristic(col("text")).as("pred_lang"))
      .orderBy(col("doc_id"))

  val langIdSql: String = {
    def frac(cls: String) =
      s"(length(text) - length(regexp_replace(text, '$cls', '', 'g'))) / CAST(greatest(length(text),1) AS DOUBLE)"
    val han = frac("[\\x{4e00}-\\x{9fff}]")
    val heb = frac("[\\x{0590}-\\x{05ff}]")
    val de = frac("[äöüßÄÖÜ]")
    val es = frac("[áéíóúñ¿¡]")
    val fr = frac("[àâçèêëîïôùûœ]")
    s"""SELECT doc_id, lang,
       |  CASE WHEN $han > 0.05 THEN 'zh'
       |       WHEN $heb > 0.05 THEN 'he'
       |       WHEN $de > $es AND $de > $fr AND $de > 0 THEN 'de'
       |       WHEN $es > $fr AND $es > 0 THEN 'es'
       |       WHEN $fr > 0 THEN 'fr'
       |       ELSE 'en' END AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Q-quality: composite quality score (north-star text analysis). Pure
    * scalar double arithmetic — bit-identical across engines. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  val qualitySql: String = {
    val stops = stopwords.map(s => s"'$s'").mkString(", ")
    val punct =
      "len(regexp_extract_all(text, '[[:punct:]]')) / CAST(greatest(length(text),1) AS DOUBLE)"
    val stop =
      s"""len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t IN ($stops)))
         | / CAST(greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) AS DOUBLE)"""
        .stripMargin.replace("\n", "")
    s"""SELECT doc_id,
       |  ROUND((least(length(text) / 500.0, 1.0)
       |       + (1.0 - least(($punct) * 5.0, 1.0))
       |       + least(($stop) * 4.0, 1.0)) / 3.0, 6) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Q-quality-logistic: fixed-weight logistic quality classifier scored
    * over the whole corpus — the batch-inference shape of a trained
    * fastText/logreg quality model (weights would come from offline
    * training; here they are fixed constants so the oracle can reproduce
    * the exact arithmetic). Pure per-row projection — no shuffle until
    * the final top-K (TakeOrderedAndProject), which is how model scoring
    * over 100 TB should look: the featurizer and the dot product ride the
    * scan. Ranked on the exact score (round only for display), id
    * tiebreak, so both engines select identical rows. */
  def qualityLogistic(spark: SparkSession, dir: String): DataFrame = {
    val text = col("text")
    val lenN = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val z = lit(-1.0) + lit(3.0) * lenN - lit(8.0) * punctRatio(text) +
      lit(5.0) * stopwordRatio(text)
    val score = lit(1.0) / (lit(1.0) + exp(-z))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), score.as("s"))
      .orderBy(col("s").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("source"), round(col("s"), 6).as("ml_score"))
  }

  val qualityLogisticSql: String = {
    val stops = stopwords.map(s => s"'$s'").mkString(", ")
    val punct =
      "len(regexp_extract_all(text, '[[:punct:]]')) / CAST(greatest(length(text), 1) AS DOUBLE)"
    val stop =
      s"""len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t IN ($stops)))
         | / CAST(greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) AS DOUBLE)"""
        .stripMargin.replace("\n", "")
    s"""WITH scored AS (SELECT doc_id, source,
       |    1.0 / (1.0 + exp(-(-1.0 + 3.0 * least(length(text) / 500.0, 1.0)
       |                       - 8.0 * ($punct) + 5.0 * ($stop)))) AS s
       |  FROM documents)
       |SELECT doc_id, source, ROUND(s, 6) AS ml_score
       |FROM scored ORDER BY s DESC, doc_id LIMIT 50""".stripMargin
  }

  /** Q-fingerprint: md5-of-normalized-text fingerprint + per-fingerprint
    * cardinality (the exact-dedup key; SURVEY.md §2.10). */
  def fingerprintQuery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .withColumn("n_same_fp", count(lit(1)).over(w))
      .orderBy(col("doc_id"))
  }

  val fingerprintSql: String =
    """WITH fps AS (
      |  SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
      |  FROM documents)
      |SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS n_same_fp
      |FROM fps ORDER BY doc_id""".stripMargin

  /** Q-chat-fold: multi-line message folding. WhatsApp exports continue a
    * message on bare lines after its `[ts] ~ sender:` header; the
    * reference parses line-by-line and treats every continuation as its
    * own (unparseable) message (`embed/embed.go:94-111` — FIXTURES.md B1).
    * Intended semantics: mark header lines, assign each line the running
    * count of headers seen (the classic fold-to-sessions window trick),
    * and concatenate each group back into one message.
    *
    * The synthetic export interleaves headers and continuations
    * deterministically from the documents table (every 3rd line is a
    * continuation). Scale note: the fold needs a total line order, which
    * is only meaningful per export FILE — the window partitions by the
    * export file (here synthesized as doc_id % 8 files), so the running
    * sum shuffles once on the file key and never funnels the corpus
    * through a single task. */
  def chatFold(spark: SparkSession, dir: String): DataFrame =
    foldChatLines(
      Tables.documents(spark, dir)
        .withColumn("export_file",
          concat(lit("chat_"), (col("doc_id") % 8).cast("string"), lit(".txt")))
        .withColumn("line",
          when(col("doc_id") % 3 =!= lit(2), chatLine(substring(col("text"), 1, 40)))
            .otherwise(substring(col("text"), 1, 40)))
        .select(col("export_file"), col("doc_id").as("line_no"), col("line")),
      partitionCols = Seq("export_file"))

  /** The fold core over (line_no, line) — callable on any export so the
    * hand-computed semantics tests exercise THIS code, not a copy.
    * `partitionCols` (normally the export-file key) bounds the running
    * header count to one file: the plan shows hashpartitioning(file),
    * not Exchange SinglePartition. Empty partitionCols = one global
    * ordering (single-file exports / small tests only — does not scale). */
  def foldChatLines(lines: DataFrame, partitionCols: Seq[String] = Seq.empty): DataFrame = {
    val byLine =
      if (partitionCols.isEmpty) Window.orderBy(col("line_no"))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col("line_no"))
    val groupCols = partitionCols.map(col) :+ col("msg_no")
    lines
      .withColumn("is_header", hasChatPrefix(col("line")).cast("int"))
      .withColumn("msg_no", sum(col("is_header")).over(byLine))
      .groupBy(groupCols: _*)
      .agg(
        count(lit(1)).as("n_lines"),
        max(when(col("is_header") === 1, chatSender(col("line")))).as("sender"),
        concat_ws(" ",
          sort_array(collect_list(struct(col("line_no"),
            when(col("is_header") === 1, chatMessage(col("line")))
              .otherwise(col("line")).as("part"))))
            .getField("part")).as("message"))
      .orderBy(groupCols: _*)
  }

  val chatFoldSql: String =
    s"""WITH lines AS (
       |  SELECT 'chat_' || (doc_id % 8) || '.txt' AS export_file,
       |    doc_id AS line_no,
       |    CASE WHEN doc_id % 3 <> 2
       |      THEN $chatLineSql || substr(text, 1, 40)
       |      ELSE substr(text, 1, 40) END AS line
       |  FROM documents),
       |marked AS (
       |  SELECT export_file, line_no, line,
       |    CASE WHEN regexp_matches(line, '$prefixSqlPattern') THEN 1 ELSE 0 END AS is_header
       |  FROM lines),
       |grouped AS (
       |  SELECT *, CAST(SUM(is_header) OVER (PARTITION BY export_file ORDER BY line_no
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS msg_no
       |  FROM marked)
       |SELECT export_file, msg_no, COUNT(*) AS n_lines,
       |  MAX(CASE WHEN is_header = 1
       |        THEN regexp_extract(line, '^\\[[^\\]]*\\]\\s*~?\\s*([^:]*):', 1) END) AS sender,
       |  string_agg(CASE WHEN is_header = 1
       |               THEN regexp_replace(line, '$prefixSqlPattern', '')
       |               ELSE line END, ' ' ORDER BY line_no) AS message
       |FROM grouped GROUP BY export_file, msg_no ORDER BY export_file, msg_no""".stripMargin

  /** Q-winnow: rolling-hash winnowing fingerprints (k=5 chars, w=4
    * windows) over the normalized text — the substring-robust fingerprint
    * next to the exact md5 one; docs sharing ≥ k+w−1 = 8 characters of
    * text share a fingerprint. Scalars derived per doc keep the output
    * hash-comparable (the raw sets are array-typed). */
  def winnow(spark: SparkSession, dir: String): DataFrame = {
    val fp = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.WinnowFingerprints(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          normalizeText(col("text"))), 5, 4))
    Tables.documents(spark, dir)
      .select(col("doc_id"), fp.as("fp"))
      .select(col("doc_id"),
        size(col("fp")).as("n_fps"),
        // empty set (text shorter than k) -> NULL, matching the oracle's
        // fp[1] / list_sum([]) semantics; bare element_at on an empty
        // array THROWS under ANSI mode
        when(size(col("fp")) > 0, element_at(col("fp"), 1)).as("fp_min"),
        when(size(col("fp")) > 0,
          aggregate(col("fp"), lit(0L), (s, x) => s + x)).as("fp_sum"))
      .orderBy(col("doc_id"))
  }

  val winnowSql: String =
    """WITH cs AS (SELECT doc_id,
      |    list_transform(
      |      regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ''),
      |      x -> unicode(x)) AS c
      |  FROM documents),
      |h AS (SELECT doc_id,
      |    list_transform(range(1, greatest(len(c) - 3, 1)),
      |      i -> ((((CAST(c[i] AS BIGINT)*257 + c[i+1])*257 + c[i+2])*257 + c[i+3])*257 + c[i+4])
      |           % 1000000007) AS hs
      |  FROM cs),
      |fps AS (SELECT doc_id,
      |    CASE WHEN len(hs) = 0 THEN []
      |         ELSE list_sort(list_distinct(list_transform(
      |                range(1, greatest(len(hs) - 2, 2)),
      |                j -> list_min(hs[j:j+3])))) END AS fp
      |  FROM h)
      |SELECT doc_id, len(fp) AS n_fps, fp[1] AS fp_min,
      |  CAST(list_sum(fp) AS BIGINT) AS fp_sum
      |FROM fps ORDER BY doc_id""".stripMargin

  /** BM25 parameters (Robertson/Spärck Jones defaults) and the fixed demo
    * query. (k1+1) and (1−b) are pre-folded into literals so the Spark and
    * DuckDB expression trees are identical symbol-for-symbol. */
  private[graft] val Bm25Terms = Seq("vector", "hash", "join")

  /** Q-bm25: keyword retrieval — BM25-ranked top-10 documents for a fixed
    * 3-term query, the lexical complement of the embedding search path
    * (hybrid retrieval runs both and fuses). All corpus statistics stay
    * relational: df per term over the exploded token stream (3 rows,
    * broadcast), N and avgdl in a 1-row aggregate crossed in — nothing
    * collects to the driver. Per-term contributions are pivoted into
    * FIXED-ORDER columns before the final sum so the double additions
    * associate identically in Spark and DuckDB (a groupBy SUM of doubles
    * has engine-dependent order — the established pivot-parity trick). At
    * 100 TB: tf is one shuffle of (doc, term) partial counts for query
    * terms only; everything else is metadata-sized. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val lens = toks.select(col("doc_id"), size(col("t")).as("dl"))
    // N docs + average doc length: token counts are small ints, so the
    // double AVG is exactly sum/count in BOTH engines (no FP-order issue)
    val stats = lens.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("w"))
      .filter(col("w").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfd = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfd), "w")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
    contrib
      .groupBy(col("doc_id")).pivot("w", Bm25Terms).agg(sum(col("s")))
      .select(col("doc_id"),
        round(Bm25Terms.map(t => coalesce(col(t), lit(0.0))).reduce(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** The BM25 oracle for ANY term set — the parameterized twin of the
    * engine's term-parameterized serve ([[graft.sources.InvertedIndex]]'s
    * bm25Over(terms)): same CTE chain, same fixed-order pivot assembly
    * (one FILTER column per term so the double additions associate
    * identically on both engines), n pivot columns instead of three. */
  private[graft] def bm25SqlFor(terms: Seq[String]): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val pivCols = terms.zipWithIndex.map { case (t, i) =>
      s"    COALESCE(SUM(s) FILTER (WHERE w = '$t'), 0.0) AS s${i + 1}"
    }.mkString(",\n")
    val total = terms.indices.map(i => s"s${i + 1}").mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |              FROM documents),
       |lens AS (SELECT doc_id, len(t) AS dl FROM toks),
       |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens),
       |tf AS (SELECT doc_id, w, COUNT(*) AS tf
       |       FROM (SELECT doc_id, unnest(t) AS w FROM toks)
       |       WHERE w IN ($inList) GROUP BY 1, 2),
       |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
       |contrib AS (SELECT tf.doc_id, tf.w,
       |    ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / stats.avgdl)) AS s
       |  FROM tf JOIN df USING (w) JOIN lens USING (doc_id) CROSS JOIN stats),
       |piv AS (SELECT doc_id,
       |$pivCols
       |  FROM contrib GROUP BY doc_id)
       |SELECT doc_id, ROUND($total, 6) AS score FROM piv
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }

  val bm25Sql: String = bm25SqlFor(Bm25Terms)

  /** Synthetic field split for [[bm25f]]: the first [[TitleTokens]]
    * tokens are the "title" field, the rest the "body" (the corpus has
    * no real field structure — the split is deterministic so both
    * engines derive the identical fields; a production corpus would
    * carry real field columns into the same arithmetic). INTEGER field
    * weight so the weighted tf and weighted dl stay exact integers —
    * the quantization that makes the whole score cross-engine
    * replayable. */
  private[graft] val TitleTokens = 3
  private[graft] val TitleWeight = 2

  /** Q-bm25f: BM25F multi-field scoring (Zaragoza et al.'s simple BM25F,
    * the Lucene/Elasticsearch multi-field discipline): per-field term
    * frequencies combine BEFORE saturation — tf̃ = Σ_f w_f·tf_f — so a
    * title hit is worth [[TitleWeight]] body hits INSIDE the saturation
    * curve (the property a per-field-score sum gets wrong: two saturated
    * per-field scores overweight documents matching weakly in both
    * fields). Document length normalizes by the same weights
    * (dl̃ = Σ_f w_f·|field_f|), idf comes from the term's any-field df.
    * Same (k1, b) = (1.2, 0.75) and fixed-order pivot sum as [[bm25]].
    */
  def bm25f(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val lens = toks.select(col("doc_id"),
      (least(size(col("t")), lit(TitleTokens)) * TitleWeight +
        greatest(size(col("t")) - TitleTokens, lit(0))).as("wdl"))
    val stats = lens.agg(count(lit(1)).as("n"), avg(col("wdl")).as("avgdl"))
    val occ = toks.select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "w")))
      .filter(col("w").isin(Bm25Terms: _*))
      .withColumn("fw", when(col("pos") < TitleTokens,
        lit(TitleWeight.toLong)).otherwise(lit(1L)))
    val tf = occ.groupBy(col("doc_id"), col("w")).agg(sum(col("fw")).as("wtf"))
    val dfd = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfd), "w")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("wtf") * 2.2) /
          (col("wtf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("wdl") / col("avgdl"))))
    contrib
      .groupBy(col("doc_id")).pivot("w", Bm25Terms).agg(sum(col("s")))
      .select(col("doc_id"),
        round(Bm25Terms.map(t => coalesce(col(t), lit(0.0))).reduce(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  val bm25fSql: String = {
    val inList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val pivCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"    COALESCE(SUM(s) FILTER (WHERE w = '$t'), 0.0) AS s${i + 1}"
    }.mkString(",\n")
    val total = Bm25Terms.indices.map(i => s"s${i + 1}").mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |              FROM documents),
       |lens AS (SELECT doc_id,
       |           $TitleWeight * least(len(t), $TitleTokens)
       |             + greatest(len(t) - $TitleTokens, 0) AS wdl
       |         FROM toks),
       |stats AS (SELECT COUNT(*) AS n, AVG(wdl) AS avgdl FROM lens),
       |occ AS (SELECT doc_id, i, t[i] AS w
       |        FROM (SELECT doc_id, t,
       |                unnest(range(1, len(t) + 1)) AS i FROM toks)),
       |tf AS (SELECT doc_id, w,
       |         SUM(CASE WHEN i <= $TitleTokens THEN $TitleWeight ELSE 1 END) AS wtf
       |       FROM occ WHERE w IN ($inList) GROUP BY 1, 2),
       |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
       |contrib AS (SELECT tf.doc_id, tf.w,
       |    ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |      * (tf.wtf * 2.2)
       |      / (tf.wtf + 1.2 * (0.25 + 0.75 * lens.wdl / stats.avgdl)) AS s
       |  FROM tf JOIN df USING (w) JOIN lens USING (doc_id) CROSS JOIN stats),
       |piv AS (SELECT doc_id,
       |$pivCols
       |  FROM contrib GROUP BY doc_id)
       |SELECT doc_id, ROUND($total, 6) AS score FROM piv
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }

  /** GPT-2-style pre-tokenizer pattern, ASCII-simplified so Java regex and
    * RE2 agree: contractions, space-prefixed letter runs, space-prefixed
    * digit runs, space-prefixed punctuation runs. Alternation order
    * matters (longest-specific first) and is identical on both sides. */
  private val BpeIshPattern = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Q-token-bpe: subword-style token accounting — the billing/budgeting
    * pass of a training pipeline (whitespace counting under-reports BPE
    * token spend by 20–40% on punctuated text). Pure map-side: one regex
    * scan per doc, no shuffle until the final sort. */
  def tokenBpe(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit(BpeIshPattern), lit(0)).as("toks"),
        size(split(trim(col("text")), "\\s+")).as("n_ws"))
      .select(col("doc_id"),
        size(col("toks")).as("n_bpe"),
        size(array_distinct(col("toks"))).as("n_bpe_unique"),
        col("n_ws"),
        round(size(col("toks")).cast("double") /
          greatest(col("n_ws"), lit(1)).cast("double"), 6).as("bpe_per_word"))
      .orderBy(col("doc_id"))

  val tokenBpeSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    regexp_extract_all(text, '${BpeIshPattern.replace("'", "''")}') AS toks,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws
       |  FROM documents)
       |SELECT doc_id, len(toks) AS n_bpe,
       |  len(list_distinct(toks)) AS n_bpe_unique, n_ws,
       |  ROUND(CAST(len(toks) AS DOUBLE) / GREATEST(n_ws, 1), 6) AS bpe_per_word
       |FROM t ORDER BY doc_id""".stripMargin

  /** Q-tfidf: top-3 characteristic terms per document (first 50 docs) by
    * tf·idf. All corpus statistics stay relational — df is an aggregate
    * over the exploded (doc, term) stream, N a 1-row count crossed in;
    * the score is a single product chain (no sum of doubles, so no
    * FP-association concern — just one final round). At 100 TB the
    * doc-term explode is the only heavy shuffle; df/N are
    * metadata-sized and broadcast. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
    val tf = terms.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    // df directly from tf — its rows are already distinct (doc, term), so
    // this avoids a second tokenization pass + corpus-wide distinct.
    val dfd = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.filter(col("doc_id") < 50)
      .join(dfd, "w")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("w").as("term"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  val tfidfSql: String =
    """WITH terms AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |               FROM documents),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY w),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (SELECT doc_id, w,
      |    ROUND(tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
      |  FROM tf JOIN df USING (w) CROSS JOIN n WHERE doc_id < 50),
      |rk AS (SELECT doc_id, w, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rk
      |  FROM scored)
      |SELECT doc_id, rk, w AS term, score FROM rk
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Q-entropy: character-level Shannon entropy per document — the
    * classic gibberish/boilerplate quality signal (low H = repeated
    * characters, high H = noise). H = ln(n) − (Σ cᵢ·ln cᵢ)/n from EXACT
    * integer character counts; the only FP hazard is the Σ over distinct
    * characters, which both engines fold sequentially over the SAME
    * char-sorted list (ordered aggregate), so the double association is
    * identical. The per-(doc,char) count is one partial-aggregated
    * shuffle; the fold is per-doc over ≤ alphabet-size terms. */
  def entropy(spark: SparkSession, dir: String): DataFrame = {
    // ONE map-side pass: the counts + codepoint-ordered Σ c·ln c fold run
    // inside a native expression ([[graft.functions.CharEntropy]]) — the
    // relational form (per-character explode + two shuffles) produced the
    // same doubles 6× slower at sf0.1. Empty docs are filtered out to
    // match the oracle (its position range is empty for '').
    val stats = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CharEntropy(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("text"))))
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= 1)
      .withColumn("s", stats)
      .select(col("doc_id"), col("s.n").as("n"),
        col("s.distinct_chars").as("distinct_chars"),
        round(log(col("s.n").cast("double")) - col("s.sum_clnc") / col("s.n"), 6)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  val entropySql: String =
    """WITH pos AS (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
      |             FROM documents),
      |chars AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch FROM pos),
      |cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS distinct_chars,
      |          list(c * ln(c) ORDER BY ch) AS terms
      |        FROM cnt GROUP BY doc_id)
      |SELECT doc_id, n, distinct_chars,
      |  ROUND(ln(n) - CAST(list_sum(terms) AS DOUBLE) / n, 6) AS entropy
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Q-collocations: corpus-wide bigram PMI — the collocation-mining pass
    * of corpus analysis (PMI spikes on fixed phrases, the signal used for
    * tokenizer-vocabulary and boilerplate discovery). PMI(a,b) =
    * ln(c_ab·T / (c_a·c_b)) over EXACT integer counts with one ln per
    * surviving bigram — no FP accumulation anywhere. Two partial-agg
    * shuffles (unigrams, bigrams) + a broadcast of the 1-row total; the
    * min-count filter keeps the ranked output statistically meaningful
    * and bounded. Only the 1-row total broadcasts; unigram counts join
    * by shuffle (a corpus vocabulary outgrows any broadcast cap). */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("tot"))
    // adjacent pairs map-side: zip the token array against itself shifted
    // by one — no positional self-join touches the corpus
    val bi = toks
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("w"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("w2"))).as("p"))
      .select(col("p.w").as("w"), col("p.w2").as("w2"))
      .groupBy(col("w"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    // unigram counts SHUFFLE-join (corpus-wide vocabulary is not
    // broadcastable at scale — only the 1-row total is); AQE still
    // broadcasts when the vocab is genuinely small
    bi.join(uni.select(col("w"), col("c").as("c_a")), "w")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w").as("w1"), col("w2"), col("c_ab"),
        round(log(col("c_ab").cast("double") * col("tot").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }

  val collocationsSql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |              FROM documents),
      |uni AS (SELECT w, COUNT(*) AS c
      |        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
      |total AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM uni),
      |pairs AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      |          FROM toks),
      |bi AS (SELECT w1, w2, COUNT(*) AS c_ab FROM pairs
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 5)
      |SELECT w1, w2, c_ab,
      |  ROUND(ln(CAST(c_ab AS DOUBLE) * tot / (ua.c * ub.c)), 6) AS pmi
      |FROM bi JOIN uni ua ON w1 = ua.w JOIN uni ub ON w2 = ub.w
      |CROSS JOIN total
      |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  /** Q-winnow-overlap: MOSS-style local-similarity detection — document
    * pairs sharing ≥ 5 winnowed fingerprints. Where whole-doc Jaccard
    * needs globally similar documents, winnowing guarantees any shared
    * run of ≥ w+k−1 chars leaves at least one COMMON fingerprint, so this
    * catches localized copying (a stolen paragraph in an otherwise
    * different doc). Rides the same df-capped inverted-index pair core as
    * the shingle family — fingerprints are already 8-byte longs, so the
    * shuffle needs no re-hash. */
  def winnowOverlap(spark: SparkSession, dir: String): DataFrame = {
    val fp = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.WinnowFingerprints(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          normalizeText(col("text"))), 5, 4))
    val postings = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(fp).as("gram"))
    Dedup.pairStatsFromPostings(postings, maxDf = 32)
      .filter(col("i") >= 5)
      .select(col("doc_a"), col("doc_b"), col("i").as("shared_fps"),
        col("na").as("n_a"), col("nb").as("n_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val winnowOverlapSql: String =
    """WITH cs AS (SELECT doc_id,
      |    list_transform(
      |      regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ''),
      |      x -> unicode(x)) AS c
      |  FROM documents),
      |h AS (SELECT doc_id,
      |    list_transform(range(1, greatest(len(c) - 3, 1)),
      |      i -> ((((CAST(c[i] AS BIGINT)*257 + c[i+1])*257 + c[i+2])*257 + c[i+3])*257 + c[i+4])
      |           % 1000000007) AS hs
      |  FROM cs),
      |fps AS (SELECT doc_id,
      |    CASE WHEN len(hs) = 0 THEN []
      |         ELSE list_sort(list_distinct(list_transform(
      |                range(1, greatest(len(hs) - 2, 2)),
      |                j -> list_min(hs[j:j+3])))) END AS fp
      |  FROM h),
      |ex0 AS (SELECT doc_id, unnest(fp) AS gram FROM fps),
      |dropped AS (SELECT gram FROM ex0 GROUP BY gram HAVING COUNT(*) > 32),
      |ex AS (SELECT doc_id, gram FROM ex0 ANTI JOIN dropped USING (gram)),
      |n AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      |          FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT doc_a, doc_b, i AS shared_fps,
      |  na.n AS n_a, nb.n AS n_b
      |FROM inter
      |JOIN n na ON doc_a = na.doc_id
      |JOIN n nb ON doc_b = nb.doc_id
      |WHERE i >= 5 ORDER BY doc_a, doc_b""".stripMargin

  /** Q-perplexity: bigram-language-model quality score per document — the
    * classic LM-based corpus filter (a doc scoring far above the corpus
    * LM's expectation is boilerplate-free noise; far below is repetitive
    * template text). score = −(1/n)·Σ ln P(w_i | w_{i−1}) with add-one
    * smoothing over corpus-wide counts. The Σ over a doc's bigrams is a
    * double fold in POSITION order on both engines (the ordered-fold
    * parity pattern), every other input is an exact integer count, so the
    * score is bit-identical. Scale shape: bigram/unigram count tables are
    * partial-aggregated once; the scoring join shuffles (doc, pos, w1, w2)
    * tuples; V and the fold are per-doc local. */
  def perplexity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val pairs = toks
      .select(col("doc_id"), posexplode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("w1"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("w2"))))
      .select(col("doc_id"), col("pos"), col("col.w1").as("w1"), col("col.w2").as("w2"))
    val bi = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_a"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    pairs
      .join(bi, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("term",
        log((col("c_ab") + 1).cast("double") / (col("c_a") + col("v")).cast("double")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(struct(col("pos"), col("term")))).as("terms"))
      .withColumn("sum_lnp",
        aggregate(col("terms"), lit(0.0), (acc, x) => acc + x.getField("term")))
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("sum_lnp") / col("n_bigrams"), 6).as("nll"))
      .orderBy(col("doc_id"))
  }

  val perplexitySql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |              FROM documents),
      |pairs AS (SELECT doc_id, unnest(range(1, len(t))) AS pos,
      |                 unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      |          FROM toks),
      |bi AS (SELECT w1, w2, COUNT(*) AS c_ab FROM pairs GROUP BY 1, 2),
      |uni AS (SELECT w, COUNT(*) AS c_a
      |        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
      |vocab AS (SELECT COUNT(*) AS v FROM uni),
      |terms AS (SELECT doc_id, pos,
      |    ln(CAST(c_ab + 1 AS DOUBLE) / (c_a + v)) AS term
      |  FROM pairs JOIN bi USING (w1, w2)
      |  JOIN uni ON w1 = uni.w CROSS JOIN vocab),
      |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |          CAST(list_sum(list(term ORDER BY pos)) AS DOUBLE) AS sum_lnp
      |        FROM terms GROUP BY doc_id)
      |SELECT doc_id, n_bigrams, ROUND(-sum_lnp / n_bigrams, 6) AS nll
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Q-compress-ratio: DEFLATE-compressibility quality signal — the
    * deflated/raw byte ratio per doc (low ratio = repetitive boilerplate,
    * the cheap stand-in for an LM quality score; see
    * [[graft.functions.DeflateStats]]). Pure map-side native kernel, one
    * pass over the text bytes, no shuffle before the output sort. zlib
    * has no DuckDB twin, so this is rows-only by design; determinism and
    * the boilerplate<prose ordering are gated by DeflateStatsSpec. */
  def compressRatio(spark: SparkSession, dir: String): DataFrame = {
    val stats = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.DeflateStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("text"))))
    Tables.documents(spark, dir)
      .withColumn("s", stats)
      .select(col("doc_id"), col("s.raw_bytes").as("raw_bytes"),
        col("s.deflated_bytes").as("deflated_bytes"),
        when(col("s.raw_bytes") > 0,
          round(col("s.deflated_bytes").cast("double") / col("s.raw_bytes"), 6))
          .as("ratio"))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary size for the OOV-rate profile (the corpus has 31 distinct
    * tokens; 25 leaves a discriminating out-of-vocabulary tail). */
  val OovVocabK = 25

  /** Q-oov-rate: out-of-vocabulary fraction per doc against the corpus'
    * own top-[[OovVocabK]] token vocabulary (count desc, token asc
    * tiebreak — fully deterministic cut). The tokenizer-coverage profile
    * of a training corpus: docs with high OOV under a candidate vocab are
    * the ones that will fragment into byte-fallback tokens. The vocab is
    * K rows — a TakeOrderedAndProject, then BROADCAST to a map-side
    * left-anti membership probe; the only corpus-sized shuffles are the
    * token-count partial aggregation and the per-doc re-aggregation. */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(OovVocabK)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        round(col("n_oov").cast("double") / col("n_tok"), 6))
      .orderBy(col("doc_id"))
  }

  val oovRateSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |vocab AS (SELECT tok FROM (
       |    SELECT tok, COUNT(*) AS cnt,
       |      ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
       |    FROM toks GROUP BY tok) WHERE rk <= $OovVocabK)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
       |  CAST(SUM(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  ROUND(CAST(SUM(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS oov_frac
       |FROM toks LEFT JOIN vocab ON toks.tok = vocab.tok
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Misra–Gries summary size for q_heavy_hitters: any term with global
    * frequency above N/(k+1) is GUARANTEED to survive as a candidate in at
    * least one partition (pigeonhole over the per-partition bound), which
    * is what licenses gating the 2-pass result on the exact oracle. On the
    * testdata's bounded vocabulary (31 words < k) the summary holds
    * everything — the eviction path and the containment guarantee under a
    * 5000-term Zipf stream are exercised in HeavyHittersSpec instead. */
  val HeavyHittersK = 64

  /** Per-partition Misra–Gries pass: at most k counters per partition; a
    * term arriving at a full summary decrements every counter (zeros
    * evict). The ONE deliberate `mapPartitions` in the text suite — the
    * summary is genuinely imperative per-partition state that no
    * aggregate expression expresses, and its output is candidate TERMS
    * only (≤ partitions·k strings, metadata-sized). */
  private[operators] def misraGriesCandidates(
      terms: org.apache.spark.sql.Dataset[String], k: Int): DataFrame =
    misraGriesSummary(terms, k)
      .filter(col("w").isNotNull).select(col("w")).distinct()

  /** The MG pass with its bookkeeping: candidate rows (w, 0, false) plus
    * ONE sentinel row per partition (null, partition term count, did any
    * eviction run). The sentinel is what lets [[heavyHitters]] check its
    * exactness precondition without a second corpus pass: total N is the
    * sum of partition counts, and "no eviction anywhere" certifies the
    * summary held every distinct term regardless of the N/(k+1) bound. */
  private[operators] def misraGriesSummary(
      terms: org.apache.spark.sql.Dataset[String], k: Int): DataFrame = {
    import terms.sparkSession.implicits._
    terms.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      var evicted = false
      it.foreach { t =>
        n += 1
        counts.get(t) match {
          case Some(c) => counts(t) = c + 1
          case None if counts.size < k => counts(t) = 1L
          case None =>
            evicted = true
            for (key <- counts.keys.toArray) {
              val c = counts(key) - 1
              if (c == 0) counts.remove(key) else counts(key) = c
            }
        }
      }
      counts.keysIterator.map(w => (w, 0L, false)) ++
        Iterator(((null: String), n, evicted))
    }.toDF("w", "pn", "evicted")
  }

  /** Q-heavy-hitters: EXACT top-10 terms via the 2-PASS HEAVY-HITTERS
    * pattern — pass 1 is a per-partition Misra–Gries summary (bounded
    * memory, NO shuffle of the full term frequency table), pass 2 exactly
    * recounts ONLY the broadcast candidate set and takes the true top-10.
    * The result is exact (hence the plain exact-top-10 oracle): the MG
    * guarantee puts every term with frequency > N/(k+1) in the candidate
    * set, and the recount replaces approximate counts with true ones.
    *
    * Why this beats the naive `groupBy(term)` at 100 TB: the naive plan
    * shuffles the ENTIRE term histogram — Heaps-law vocabulary on a web
    * corpus is billions of distinct grams — while this plan shuffles only
    * candidate-term rows (pass 2's groupBy is over ≤ partitions·k terms'
    * occurrences) plus the candidate strings themselves. The same 2-pass
    * shape is how every production frequent-items job (stopword
    * induction, hot-key detection before salting) actually runs. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(spark, dir, exact = true)

  /** `exact = false` is the explicit escape hatch for flatter term
    * distributions: the candidate recount still returns TRUE counts for
    * every returned term (MG never inflates), but a just-below-threshold
    * term may be missing from the candidate set, so ranks near the tail
    * can be occupied by the wrong term. A caller accepting that trade
    * gets the summary-bounded plan on any corpus; the declared query
    * keeps `exact = true` because its oracle is the exact top-10. */
  def heavyHitters(spark: SparkSession, dir: String, exact: Boolean): DataFrame = {
    import spark.implicits._
    val terms = Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .as[String]
    // one MG pass, materialized: candidates + per-partition (count,
    // evicted) sentinels ride the same job
    val summary = misraGriesSummary(terms, HeavyHittersK).localCheckpoint(true)
    val sentinels = summary.filter(col("w").isNull)
      .agg(coalesce(sum(col("pn")), lit(0L)).as("n"),
        coalesce(max(col("evicted")), lit(false)).as("evicted")).head()
    val (total, anyEvicted) = (sentinels.getLong(0), sentinels.getBoolean(1))
    val cand = summary.filter(col("w").isNotNull).select(col("w")).distinct()
    val top = terms.toDF.join(broadcast(cand), Seq("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(10)
      .localCheckpoint(eager = true)
    // EXACTNESS PRECONDITION, checked loudly: the 2-pass result is exact
    // iff no summary ever evicted (every distinct term is a candidate) OR
    // every returned rank clears the MG containment bound N/(k+1) —
    // otherwise a just-below-threshold term could be missing from the
    // candidate set and the "exact top-10" claim (and its oracle) would
    // silently become approximate on a future corpus.
    if (exact && anyEvicted) {
      val minTop = top.agg(coalesce(min(col("n")), lit(0L))).head().getLong(0)
      // smallest K whose containment bound the observed counts satisfy:
      // minTop·(K+1) > N  ⇔  K ≥ floor(N / minTop)  (minTop > 0)
      val kNeeded = if (minTop > 0) total / minTop else -1L
      val hint = if (kNeeded > 0) s"HeavyHittersK >= $kNeeded would satisfy " +
        s"the bound on this corpus" else "no K can bound an empty result"
      require(minTop * (HeavyHittersK + 1L) > total,
        s"heavy-hitters exactness precondition violated: rank-10 count " +
          s"$minTop ≤ N/(k+1) = $total/${HeavyHittersK + 1} — $hint; " +
          s"or call heavyHitters(..., exact = false) to accept the " +
          s"summary-bounded approximate tail")
    }
    top
  }

  val heavyHittersSql: String =
    """WITH terms AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |               FROM documents)
      |SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM terms
      |GROUP BY w ORDER BY n DESC, w LIMIT 10""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> (heavyHitters _),
    "q_oov_rate" -> (oovRate _),
    "q_compress_ratio" -> (compressRatio _),
    "q_perplexity" -> (perplexity _),
    "q_winnow_overlap" -> (winnowOverlap _),
    "q_collocations" -> (collocations _),
    "q_entropy" -> (entropy _),
    "q_token_bpe" -> (tokenBpe _),
    "q_tfidf" -> (tfidf _),
    "q_bm25" -> (bm25 _),
    "q_bm25f" -> (bm25f _),
    "q_winnow" -> (winnow _),
    "q_chat_fold" -> (chatFold _),
    "q_parse" -> (parse _),
    "q_parse_stats" -> (parseStats _),
    "q_normalize" -> (normalize _),
    "q_textstats" -> (textStats _),
    "q_lang_filter" -> (langFilter _),
    "q_langid" -> (langId _),
    "q_quality" -> (quality _),
    "q_quality_logistic" -> (qualityLogistic _),
    "q_fingerprint" -> (fingerprintQuery _))

  def oracles: Map[String, String] = Map(
    "q_oov_rate" -> oovRateSql,
    "q_perplexity" -> perplexitySql,
    "q_winnow_overlap" -> winnowOverlapSql,
    "q_collocations" -> collocationsSql,
    "q_entropy" -> entropySql,
    "q_token_bpe" -> tokenBpeSql,
    "q_heavy_hitters" -> heavyHittersSql,
    "q_tfidf" -> tfidfSql,
    "q_bm25" -> bm25Sql,
    "q_bm25f" -> bm25fSql,
    "q_winnow" -> winnowSql,
    "q_chat_fold" -> chatFoldSql,
    "q_parse" -> parseSql,
    "q_parse_stats" -> parseStatsSql,
    "q_normalize" -> normalizeSql,
    "q_textstats" -> textStatsSql,
    "q_lang_filter" -> langFilterSql,
    "q_langid" -> langIdSql,
    "q_quality" -> qualitySql,
    "q_quality_logistic" -> qualityLogisticSql,
    "q_fingerprint" -> fingerprintSql)
}
