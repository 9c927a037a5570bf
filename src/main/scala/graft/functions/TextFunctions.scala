package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text parsing/analysis as pure column expressions.
  *
  * Covers the reference's chat-line parsing (`embed/embed.go:98-111`) with
  * *intended* semantics (its shipped regex can only capture the first token —
  * bug B1 in SURVEY.md §2.10), its pre-embedding normalization
  * (`embed/embed.go:30-31`), plus the north-star text-analysis operators
  * (token counting, language ID, quality scoring, fingerprinting).
  */
object TextFunctions {

  /** Intended chat-line parse: strip an optional `[ts] ~ sender:` prefix and
    * return the message body. Documented format (reference `main.go:32`):
    * `[09.09.23, 14:35:02] ~ john_doe: Hello world!`.
    * Lines without the prefix pass through whole (the reference embeds those
    * too — bug B2 — but as their first token only).
    */
  private val chatPrefix = "^\\[[^\\]]*\\]\\s*~?\\s*[^:]*:\\s*"

  def chatMessage(text: Column): Column =
    regexp_replace(text, chatPrefix, "")

  /** Timestamp inside the chat prefix, typed (the reference only ever treats
    * it as text). Format `dd.MM.yy, HH:mm:ss` per `main.go:32`. */
  def chatTimestamp(text: Column): Column =
    to_timestamp(regexp_extract(text, "^\\[([^\\]]*)\\]", 1), "dd.MM.yy, HH:mm:ss")

  def chatSender(text: Column): Column =
    regexp_extract(text, "^\\[[^\\]]*\\]\\s*~?\\s*([^:]*):", 1)

  /** Did the line carry the documented prefix at all? (basis of the parse
    * success/failure counters, `embed/embed.go:101-109`). */
  def hasChatPrefix(text: Column): Column =
    text.rlike(chatPrefix)

  /** Pre-embedding normalization per `embed/embed.go:30-31`: newlines to
    * spaces, collapse runs of whitespace, trim. (The reference also
    * backslash-escapes quotes — a JSON-by-string-formatting artifact we do
    * not reproduce; our pipeline has no wire format to escape for.) */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count proxy: words + punctuation marks counted
    * separately (a cheap, deterministic stand-in for a real tokenizer).
    * Guarded like [[tokenCount]]: split of the empty string yields [""]
    * (size 1), which would count a phantom subword for empty docs. */
  def approxBpeCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+"))) +
      regexp_count(text, lit("[\\p{Punct}]"))

  /** Punctuation ratio for quality scoring. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[\\p{Punct}]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Stopword ratio over a small fixed English stopword list. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stops = filter(toks, t => t.isInCollection(stopwords))
    size(stops).cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: favors medium-length docs with low
    * punctuation density and some (but not only) stopwords. Deterministic
    * arithmetic only, so it is DuckDB-reproducible. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore + punctPenalty + stopScore) / lit(3.0), 6)
  }

  /** Character-class counts used by the language-ID heuristic. */
  def countMatches(text: Column, charClassRegex: String): Column =
    length(text) - length(regexp_replace(text, charClassRegex, ""))

  /** N-gram-free language-ID heuristic over Unicode script classes plus
    * marker characters of the testdata corpora languages. Returns one of
    * zh/he/de/es/fr/en. A real model is out of scope (zero egress); the
    * point is the *shape*: a deterministic, pushdown-friendly projection. */
  def langIdHeuristic(text: Column): Column = {
    val n = greatest(length(text), lit(1)).cast("double")
    val han = countMatches(text, "[\\x{4e00}-\\x{9fff}]").cast("double") / n
    val hebrew = countMatches(text, "[\\x{0590}-\\x{05ff}]").cast("double") / n
    val de = countMatches(text, "[äöüßÄÖÜ]").cast("double") / n
    val es = countMatches(text, "[áéíóúñ¿¡]").cast("double") / n
    val fr = countMatches(text, "[àâçèêëîïôùûœ]").cast("double") / n
    when(han > 0.05, "zh")
      .when(hebrew > 0.05, "he")
      .when(de > es && de > fr && de > 0, "de")
      .when(es > fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("en")
  }

  /** Document fingerprint: md5 of the normalized text — the exact-dup key.
    * md5 (not xxhash64) so DuckDB computes the identical value. */
  def fingerprint(text: Column): Column =
    md5(normalizeText(text))
}
