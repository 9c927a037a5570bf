package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text embedding via feature hashing (the "hashing trick").
  *
  * The reference's embedding operator is an external model call — one HTTPS
  * round-trip to OpenAI per line (`embed/embed.go:29-59`), unreproducible
  * and impossible under zero egress. This replaces it with a local,
  * deterministic map: tokenize (lowercase, whitespace), hash each token
  * (FNV-1a 64 over UTF-8 bytes), accumulate ±1 into `hash mod dim`, then
  * L2-normalize. Unit-norm output means cosine against these vectors is
  * just a dot product.
  *
  * Not a semantic model — the point is the *pipeline shape*: a pure
  * per-row projection, no shuffle, no I/O, embarrassingly parallel at
  * 100 TB, vs the reference's 1-request-per-row ceiling (BASELINE.md).
  * Dimension is a parameter exactly like the reference index's
  * (`upsert/upsert.go:70`).
  *
  * Codegen emits a static call into [[FeatureHashEmbed.compute]], keeping
  * the embed projection inside whole-stage codegen.
  */
case class FeatureHashEmbed(child: Expression, dim: Int) extends UnaryExpression {

  require(dim >= 1, s"embedding dim must be >= 1, got $dim")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprUtil.checkStringInput(prettyName, child.dataType)

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    FeatureHashEmbed.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FeatureHashEmbed.compute($c, $dim)")

  override def prettyName: String = "feature_hash_embed"

  override protected def withNewChildInternal(newChild: Expression): FeatureHashEmbed =
    copy(child = newChild)
}

object FeatureHashEmbed {
  private val ws: Pattern = Pattern.compile("\\s+")

  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Static kernel shared by interpreted eval and generated code.
    *
    * Lowercasing is Locale.ROOT — the JVM-default-locale form would make
    * "I" hash differently on a Turkish-locale executor (dotless ı), a
    * silent cross-cluster determinism break. Tokenization is the corpus
    * convention ([[WordNGramShingles.compute]]: space-only trim, split
    * keeping empties) with empty tokens SKIPPED — an empty token would
    * otherwise hash a phantom feature into whitespace-edged docs. */
  def compute(input: UTF8String, dim: Int): ArrayData = {
    val text = input.toString.toLowerCase(java.util.Locale.ROOT)
    val acc = new Array[Double](dim)
    val toks = ws.split(text, -1)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = fnv1a64(toks(i))
        val slot = java.lang.Math.floorMod(h, dim.toLong).toInt
        val sign = if (((h >>> 32) & 1L) == 1L) 1.0 else -1.0
        acc(slot) += sign
      }
      i += 1
    }
    var norm = 0.0
    var d = 0
    while (d < dim) { norm += acc(d) * acc(d); d += 1 }
    val inv = if (norm > 0.0) 1.0 / math.sqrt(norm) else 0.0
    val out = new Array[Any](dim)
    d = 0
    while (d < dim) { out(d) = (acc(d) * inv).toFloat; d += 1 }
    new GenericArrayData(out)
  }
}
