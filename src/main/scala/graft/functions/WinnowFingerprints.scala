package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm) over a Rabin-Karp rolling hash — the "rolling hash" document
  * fingerprint of the training-pipeline brief, complementing the exact
  * md5 fingerprint: any two documents sharing a substring of at least
  * k+w−1 characters are guaranteed to share a fingerprint.
  *
  * Per position i, the k-gram hash is the base-257 polynomial of the
  * codepoints (Horner form, no intermediate mod). The accumulation is
  * exact in int64 for k ≤ 6: max codepoint 0x10FFFF ≈ 1.1e6, so the
  * largest value is ≈ 1.1e6·257⁵ ≈ 1.26e18 < 2^63 ≈ 9.22e18 (k = 7
  * would reach ≈ 3.2e20 and overflow). The DuckDB oracle must compute
  * the polynomial in BIGINT — for k ≥ 6 the values exceed double's 2^53
  * exact range, so a double-arithmetic oracle would silently diverge.
  * Fingerprints are the distinct minima of each w-window of consecutive
  * k-gram hashes, returned sorted. Texts shorter than k yield an empty
  * set.
  *
  * Codegen emits a static call into [[WinnowFingerprints.compute]],
  * keeping the fingerprint projection inside whole-stage codegen.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  // k ≤ 6 keeps the un-modded Horner accumulation exact in int64: the
  // largest k-gram value is ~1.1e6·257^(k−1) ≈ 1.26e18 at k = 6 (< 2^63),
  // but ≈ 3.2e20 at k = 7 — silent overflow to negatives would break
  // oracle parity. See the class doc for the BIGINT-oracle requirement.
  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
  require(k <= 6, s"k=$k would overflow the exact-in-int64 k-gram hash (max k=6)")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprUtil.checkStringInput(prettyName, child.dataType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprints.compute($c, $k, $w)")

  override def prettyName: String = "winnow_fingerprints"
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

object WinnowFingerprints {
  private val Base = 257L
  private val Mod = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String, k: Int, w: Int): ArrayData = {
    val s = input.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * Base + cps(i + j); j += 1 }
      hashes(i) = h % Mod
      i += 1
    }
    val set = new java.util.TreeSet[java.lang.Long]()
    val lastWin = math.max(m - w, 0)
    var j = 0
    while (j <= lastWin) {
      var mn = Long.MaxValue
      var t = j
      val end = math.min(j + w, m)
      while (t < end) { if (hashes(t) < mn) mn = hashes(t); t += 1 }
      set.add(mn)
      j += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }
}
