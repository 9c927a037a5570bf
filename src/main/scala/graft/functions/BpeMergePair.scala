package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step: replace every non-overlapping adjacent occurrence
  * of the symbol pair (a, b) in a symbol sequence with the merged symbol
  * a+b, scanning left to right — the inner kernel of byte-pair-encoding
  * tokenizer training (Sennrich et al. 2016). "hug" after merging (u,g)
  * is [h, ug]; [a a a] after merging (a,a) is [aa, a] (leftmost first,
  * no overlap).
  *
  * The pair is a per-iteration constant (the argmax of the global pair
  * count — planner metadata like the PQ codebook), so the merge is a PURE
  * MAP over the word-frequency table: the declarative alternative is an
  * interpreted aggregate/lambda fold per row (the round-1 HOF lesson).
  * A null element nulls the result (L2Normalize discipline).
  */
case class BpeMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  private lazy val elemNullable = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }
  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(v: Any): Any =
    BpeMergePair.compute(v.asInstanceOf[ArrayData],
      UTF8String.fromString(a), UTF8String.fromString(b))

  // Static-kernel call (PqEncode discipline); `ev.isNull` only assigned
  // when nullable (see DotProduct.doGenCode).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val aRef = ctx.addReferenceObj("bpeA", UTF8String.fromString(a),
        classOf[UTF8String].getName)
      val bRef = ctx.addReferenceObj("bpeB", UTF8String.fromString(b),
        classOf[UTF8String].getName)
      val call = s"graft.functions.BpeMergePair.compute($s, $aRef, $bRef)"
      if (elemNullable)
        s"""
           |${ev.value} = $call;
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      else s"${ev.value} = $call;"
    })

  override def prettyName: String = "bpe_merge_pair"
  override protected def withNewChildInternal(c: Expression): BpeMergePair =
    copy(child = c)
}

object BpeMergePair {
  /** Static kernel shared by interpreted eval and generated code. Returns
    * null iff the sequence has a null element. */
  def compute(s: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = s.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (s.isNullAt(i)) return null
      val cur = s.getUTF8String(i)
      if (i + 1 < n && cur.equals(a) && !s.isNullAt(i + 1) &&
          s.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2 // leftmost-first, non-overlapping
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Column wrapper (VectorFunctions discipline). */
  def merge(symbols: Column, a: String, b: String): Column =
    ColumnBridge.column(BpeMergePair(ColumnBridge.expression(symbols), a, b))
}
