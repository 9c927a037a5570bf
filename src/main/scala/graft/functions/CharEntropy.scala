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

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String): InternalRow = {
    val cps = input.toString.codePoints().toArray
    // sorted map: the Σ c·ln c fold must run in ascending codepoint order
    // (see class doc); counts are exact longs
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    while (i < cps.length) {
      counts.merge(cps(i), 1L, (a, b) => a + b)
      i += 1
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sum += c * java.lang.Math.log(c)
    }
    new GenericInternalRow(Array[Any](cps.length.toLong, counts.size().toLong, sum))
  }
}
