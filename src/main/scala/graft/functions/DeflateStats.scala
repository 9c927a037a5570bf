package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressibility statistics in one map-side pass:
  * `struct(raw_bytes, deflated_bytes)` over the string's UTF-8 bytes.
  * The deflated/raw ratio is a classic text-quality signal — machine-
  * generated boilerplate and keyword-stuffed spam compress far better
  * than natural prose — and the standard cheap stand-in for an LM-based
  * quality score at corpus-filtering scale.
  *
  * The ratio itself stays in the query (with a raw_bytes > 0 guard) so
  * the division is visible in the plan. No DuckDB twin exists for zlib,
  * so the declared query is rows-only by design; determinism and ordering
  * properties are gated by DeflateStatsSpec.
  *
  * Determinism scope: `deflated_bytes` depends on the JVM's bundled zlib.
  * It is bit-stable across runs, threads, and executors of ONE JDK build
  * (DeflateStatsSpec gates this), but a cluster mixing JDK builds — or a
  * JDK upgrade between runs — can change the count for the same text.
  * That is acceptable for the quality-signal use (the ratio shifts by a
  * rounding hair, thresholds don't care); if cross-cluster bit-stability
  * ever matters, homogenize the JDK or pin a pure-Java DEFLATE.
  *
  * Codegen emits a static call into [[DeflateStats.compute]], keeping the
  * projection inside whole-stage codegen. The Deflater instance and
  * scratch buffer are thread-local — allocated once per task thread, not
  * per row (Deflater wraps native zlib state; per-row allocation would
  * churn finalizer-backed native memory on the hot path).
  */
case class DeflateStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprUtil.checkStringInput(prettyName, child.dataType)

  override def dataType: DataType = StructType(Seq(
    StructField("raw_bytes", LongType, nullable = false),
    StructField("deflated_bytes", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    DeflateStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateStats.compute($c)")

  override def prettyName: String = "deflate_stats"

  override protected def withNewChildInternal(newChild: Expression): DeflateStats =
    copy(child = newChild)
}

object DeflateStats {

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Static kernel shared by interpreted eval and generated code. Counts
    * deflated output bytes without materializing them — the scratch
    * buffer is reused and only its fill size is summed. */
  def compute(input: UTF8String): InternalRow = {
    val bytes = input.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    new GenericInternalRow(Array[Any](bytes.length.toLong, total))
  }
}
