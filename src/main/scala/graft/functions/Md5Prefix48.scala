package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First 48 bits of md5 as a non-negative long — the engine-portable hash
  * behind MinHash/SimHash (DuckDB computes the identical value as
  * `CAST('0x' || substr(md5(x),1,12) AS BIGINT)`).
  *
  * The declarative form `conv(substring(md5(x),1,12),16,10).cast("long")`
  * materializes a 32-char hex string, substrings it, and parses base-16
  * text per row; this goes digest-bytes → long directly. Value-identical:
  * the first 12 hex chars ARE the first 6 digest bytes, big-endian.
  *
  * Codegen emits a static call into [[Md5Prefix48.compute]], so the
  * expression stays inside whole-stage codegen (a CodegenFallback here
  * split the stage and walked the expression tree interpreted on the
  * dedup hot path).
  */
case class Md5Prefix48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprUtil.checkStringInput(prettyName, child.dataType)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Prefix48.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix48.compute($c)")

  override def prettyName: String = "md5_prefix48"

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix48 =
    copy(child = newChild)
}

object Md5Prefix48 {
  // MessageDigest is not thread-safe; one per task thread.
  private val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(input.getBytes)
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }
}
