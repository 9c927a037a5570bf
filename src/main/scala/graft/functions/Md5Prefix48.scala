package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */
case class Md5Prefix48(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  // MessageDigest is not thread-safe; one per task thread.
  @transient private lazy val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(input.asInstanceOf[UTF8String].getBytes)
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }

  override def prettyName: String = "md5_prefix48"

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix48 =
    copy(child = newChild)
}
