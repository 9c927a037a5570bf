package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct word n-gram shingles of a text
  * column (the unit of n-gram Jaccard / MinHash / SimHash dedup).
  *
  * Semantics are identical to the declarative form
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', ...)))`:
  * trim, split on whitespace runs, emit the n-token sliding windows
  * (first-occurrence-distinct), or the whole trimmed text as a single
  * shingle when there are fewer than n tokens. That higher-order-function
  * form is interpreted per lambda eval (measured 13.5s for 5k docs /
  * 260k shingles); this compiled eval does the same work in one pass of
  * plain JVM string ops.
  *
  * Codegen emits a static call into [[WordNGramShingles.compute]], so the
  * shingling stays inside whole-stage codegen with the explode/groupBy
  * pipeline around it instead of splitting the stage (CodegenFallback).
  */
case class WordNGramShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprUtil.checkStringInput(prettyName, child.dataType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNGramShingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNGramShingles.compute($c, $n, $distinct)")

  override def prettyName: String = "word_ngram_shingles"

  override protected def withNewChildInternal(newChild: Expression): WordNGramShingles =
    copy(child = newChild)
}

object WordNGramShingles {
  private val ws: Pattern = Pattern.compile("\\s+")

  /** SQL-`trim` semantics: strip SPACES only. Java's String.trim strips
    * all control chars ≤ U+0020 (\t \n \r …), which would tokenize
    * whitespace-edged docs differently from the DuckDB oracle CTEs
    * (`regexp_split_to_array(trim(text), '\s+')`) and from Spark's own
    * `split(trim(text), "\\s+")` used by the token-stats half of
    * q_repetition — a latent parity seam on data the testdata happens not
    * to contain. */
  private def sqlTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  /** Static kernel shared by interpreted eval and generated code.
    *
    * Tokenization is EXACTLY `regexp_split_to_array(trim(text), '\s+')`:
    * space-only trim, and split with limit -1 so trailing empty tokens
    * are kept the way DuckDB's RE2 split keeps them (Java's default split
    * drops them — divergent on text ending in non-space whitespace).
    *
    * distinct=true (the dedup unit): first-occurrence-distinct windows,
    * whole trimmed text as a single shingle for sub-n docs.
    * distinct=false (the n-gram STREAM for frequency analysis): every
    * sliding window in order, EMPTY for sub-n docs — no fallback, a
    * 1-token doc has no bigrams. */
  def compute(input: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val text = sqlTrim(input.toString)
    val toks = ws.split(text, -1)
    if (toks.length < n) {
      if (distinct) new GenericArrayData(Array[Any](UTF8String.fromString(text)))
      else new GenericArrayData(Array.empty[Any])
    } else if (distinct) {
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      val m = toks.length - n + 1
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
