package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-level Shannon-entropy statistics in ONE map-side pass:
  * `struct(n, distinct_chars, sum_clnc)` where `sum_clnc = Σ cᵢ·ln cᵢ`
  * over the doc's per-codepoint counts, folded in ASCENDING CODEPOINT
  * ORDER. That order is the load-bearing detail for oracle parity: the
  * DuckDB oracle folds `list(c * ln(c) ORDER BY ch)` and single-char
  * binary collation equals codepoint order, so the double additions
  * associate identically on both engines (the same ordered-fold trick as
  * the relational form this replaces — which paid a corpus-wide
  * per-character explode plus two shuffles for the same numbers).
  *
  * H itself (`ln(n) − sum_clnc/n`) stays in the query so the division and
  * rounding sit in the plan, symmetric with the SQL side.
  *
  * Codegen emits a static call into [[CharEntropy.compute]], keeping the
  * projection inside whole-stage codegen.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprUtil.checkStringInput(prettyName, child.dataType)

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("sum_clnc", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override def prettyName: String = "char_entropy_stats"

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  /** Static kernel shared by interpreted eval and generated code. Sorting
    * the codepoint array and run-length counting gives the counts in
    * exactly the ascending-codepoint order the fold requires, with
    * primitive arithmetic only (no per-character boxing — this is the
    * per-character hot path of a map-side kernel). */
  def compute(input: UTF8String): InternalRow = {
    val cps = input.toString.codePoints().toArray
    java.util.Arrays.sort(cps)
    var sum = 0.0
    var distinct = 0L
    var i = 0
    while (i < cps.length) {
      var j = i + 1
      while (j < cps.length && cps(j) == cps(i)) j += 1
      val c = (j - i).toDouble
      sum += c * java.lang.Math.log(c)
      distinct += 1
      i = j
    }
    new GenericInternalRow(Array[Any](cps.length.toLong, distinct, sum))
  }
}
