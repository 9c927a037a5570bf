package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions in the SQL function registry, so pure-SQL users (and
  * `spark.sql(...)` pipelines) get the same codegen kernels as the Scala
  * API — no UDF wrapping, full Catalyst visibility (constant folding,
  * null propagation, codegen).
  *
  * Activate via config, no code changes:
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  * or `.withExtensions(new GraftExtensions)` on the session builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    // ANN routing (see AnnRouting): rewrites registered top-K similarity
    // sorts into probed-IVF scans. Live sessions get the same rule via
    // AnnRouting.install (experimental.extraOptimizations).
    ext.injectOptimizerRule(new AnnRewriteRule(_))
  }
}

object GraftExtensions {

  /** Literal-parameter extraction shared by every builder with non-column
    * parameters: a non-foldable or NULL argument fails function resolution
    * with a clear message instead of an opaque eval()/NPE crash. */
  private def foldableInt(e: Expression, fn: String, what: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $what must be a literal, got ${e.sql}")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(s"$fn: $what must not be NULL")
    v.asInstanceOf[Number].intValue()
  }

  private def foldableStr(e: Expression, fn: String, what: String): String = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $what must be a string literal, got ${e.sql}")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(s"$fn: $what must not be NULL")
    v.toString
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "",
      "", "", "", "scala_udf")

  /** One registration list feeding both wiring paths (injectFunction at
    * session build; registry insertion on a live session). */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays in double"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("vec_l2norm"),
      info("vec_l2norm", "vec_l2norm(a) - L2 norm of a float/double array"),
      (args: Seq[Expression]) => L2Norm(args.head)),
    (FunctionIdentifier("vec_l2dist"),
      info("vec_l2dist", "vec_l2dist(a, b) - euclidean distance of two arrays"),
      (args: Seq[Expression]) => L2Distance(args(0), args(1))),
    (FunctionIdentifier("vec_l2normalize"),
      info("vec_l2normalize",
        "vec_l2normalize(a) - unit-normalize an array (zero vectors pass through)"),
      (args: Seq[Expression]) => L2Normalize(args.head)),
    (FunctionIdentifier("word_ngram_shingles"),
      info("word_ngram_shingles",
        "word_ngram_shingles(text, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => WordNGramShingles(args.head,
        foldableInt(args(1), "word_ngram_shingles", "n"))),
    (FunctionIdentifier("feature_hash_embed"),
      info("feature_hash_embed",
        "feature_hash_embed(text, dim) - deterministic unit-norm embedding"),
      (args: Seq[Expression]) => FeatureHashEmbed(args.head,
        foldableInt(args(1), "feature_hash_embed", "dim"))),
    (FunctionIdentifier("md5_prefix48"),
      info("md5_prefix48", "md5_prefix48(s) - first 6 md5 digest bytes as a bigint (portable 48-bit hash)"),
      (args: Seq[Expression]) => Md5Prefix48(args.head)),
    (FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(text, k, w) - sorted distinct winnowed k-gram fingerprints"),
      (args: Seq[Expression]) => WinnowFingerprints(args.head,
        foldableInt(args(1), "winnow_fingerprints", "k"),
        foldableInt(args(2), "winnow_fingerprints", "w"))),
    (FunctionIdentifier("char_entropy_stats"),
      info("char_entropy_stats",
        "char_entropy_stats(text) - struct(n, distinct_chars, sum_clnc) for Shannon entropy"),
      (args: Seq[Expression]) => CharEntropy(args.head)),
    (FunctionIdentifier("deflate_stats"),
      info("deflate_stats",
        "deflate_stats(text) - struct(raw_bytes, deflated_bytes) DEFLATE compressibility"),
      (args: Seq[Expression]) => DeflateStats(args.head)),
    (FunctionIdentifier("pq_encode"),
      info("pq_encode",
        "pq_encode(vec, codebook, m, k, subdim) - per-subspace nearest-centroid byte codes " +
          "against a flat [m][k][subdim] codebook literal"),
      (args: Seq[Expression]) => {
        // normalize any numeric array (un-suffixed literals parse as
        // DECIMAL) through a Cast instead of blind asInstanceOfs
        val cbExpr = args(1)
        if (!cbExpr.foldable) throw new IllegalArgumentException(
          s"pq_encode: codebook must be a foldable array literal, got ${cbExpr.sql}")
        val cb = org.apache.spark.sql.catalyst.expressions.Cast(cbExpr,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, containsNull = false))
          .eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray()
        PqEncode(args.head,
          scala.collection.immutable.ArraySeq.unsafeWrapArray(cb),
          foldableInt(args(2), "pq_encode", "m"),
          foldableInt(args(3), "pq_encode", "k"),
          foldableInt(args(4), "pq_encode", "subdim"))
      }),
    (FunctionIdentifier("bpe_merge_pair"),
      info("bpe_merge_pair",
        "bpe_merge_pair(symbols, a, b) - replace adjacent (a,b) with a||b, leftmost-first"),
      (args: Seq[Expression]) => BpeMergePair(args.head,
        foldableStr(args(1), "bpe_merge_pair", "a"),
        foldableStr(args(2), "bpe_merge_pair", "b"))))

  /** Register on an already-running session (extensions configured at
    * build time can't be added retroactively). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (ident, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, i, builder)
    }
}
