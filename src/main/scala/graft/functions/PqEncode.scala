package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType}

/** Product-quantization encoder: map a (unit-normalized) vector to its `m`
  * per-subspace nearest-centroid ids in one pass — the PQ index-build
  * kernel (FAISS's encode step; the reference delegates vector storage
  * wholesale to Pinecone, `upsert/upsert.go:38-111`).
  *
  * The codebook rides the expression as a flat `[m][k][subDim]` double
  * array — m·k·subDim values (4 KB at the default geometry), planner
  * metadata exactly like the ADC lookup table, shipped to executors inside
  * the serialized plan (the codegen path pins it via `addReferenceObj`).
  * That makes encoding a PURE MAP over the corpus: no explode to (vec,
  * subspace) rows, no broadcast join against a centroid table, no
  * argmin shuffle — the shape that encodes 100 TB in one scan.
  *
  * Argmin is squared-L2 with strict `<`, so ties keep the LOWEST centroid
  * id (the relational form's `ORDER BY dist, cent_id` tiebreak). Dropped
  * (empty) Lloyd clusters are filled with +∞ coordinates by the caller and
  * can never win. A null element nulls the result (L2Normalize discipline);
  * a vector whose length ≠ m·subDim raises — dimension is a fixed upstream
  * invariant, not a scorable shape.
  */
case class PqEncode(child: Expression, codebook: Seq[Double],
                    m: Int, k: Int, subDim: Int)
    extends UnaryExpression {

  require(codebook.length == m * k * subDim,
    s"codebook length ${codebook.length} != m*k*subDim ${m * k * subDim}")
  // ids are stored SIGNED bytes and ADC consumers index 1-based arrays
  // with them — k past 128 would silently wrap/alias centroid ids
  require(k >= 1 && k <= 128, s"k must be in [1, 128] to fit a signed byte id, got $k")

  // Seq (not Array) so equals/hashCode are structural — an Array field
  // would give the expression identity equality, silently defeating
  // Catalyst canonicalization / common-subexpression elimination. The
  // kernel still gets a primitive array, converted once.
  private lazy val cbArr: Array[Double] = codebook.toArray

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  private lazy val isFloat = VectorExprUtil.elemIsFloat(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorInputs(prettyName, child.dataType)

  private lazy val elemNullable = VectorExprUtil.elementsNullable(child.dataType)
  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], isFloat, cbArr, m, k, subDim)

  // Static-kernel call (L2Normalize discipline): the loop body is shared
  // between interpreted eval and generated code; `ev.isNull` is only
  // assigned when the expression is nullable (see DotProduct.doGenCode).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
      val call = s"graft.functions.PqEncode.compute($a, $isFloat, $cbRef, $m, $k, $subDim)"
      if (elemNullable)
        s"""
           |${ev.value} = $call;
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      else s"${ev.value} = $call;"
    })

  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

object PqEncode {
  /** Static kernel shared by interpreted eval and generated code. Returns
    * null iff the vector has a null element. */
  def compute(a: ArrayData, isFloat: Boolean, cb: Array[Double],
              m: Int, k: Int, subDim: Int): ArrayData = {
    val n = a.numElements()
    if (n != m * subDim) throw new IllegalArgumentException(
      s"pq_encode: vector length $n != m*subDim ${m * subDim}")
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      vals(i) = VectorExprUtil.get(a, i, isFloat)
      i += 1
    }
    val out = new Array[Byte](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var kk = 0
      while (kk < k) {
        val base = (mm * k + kk) * subDim
        val off = mm * subDim
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val x = vals(off + d) - cb(base + d)
          s += x * x
          d += 1
        }
        if (s < bestD) { bestD = s; best = kk }
        kk += 1
      }
      out(mm) = best.toByte
      mm += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column wrapper (VectorFunctions discipline). */
  def encode(a: Column, codebook: Array[Double], m: Int, k: Int, subDim: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(a),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(codebook), m, k, subDim))
}
