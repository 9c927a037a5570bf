package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Sparse vector representation — the reference's wire schema carries
  * parallel `indices`/`values` arrays next to the dense values
  * (`main.go:45-48`, deserialized but never produced by the reference
  * itself). SURVEY.md §1.2 maps it to
  * `struct<indices: array<int>, values: array<float>>`; these are the
  * producing/consuming column operators.
  *
  * toSparse/selfDot are per-row projections whose HOF lambdas are fine —
  * sparsification is a declared-surface operator, not the scoring hot
  * path. Densification is the exception: a lambda re-evaluating a
  * map-build per output slot would be O(dim·nnz) per row (no CSE inside
  * Catalyst lambdas), so [[SparseToDense]] is a native one-pass scatter.
  */
object SparseVectors {

  /** Magnitude-threshold sparsification: keep elements with |x| ≥ eps as
    * (index, value) pairs, 0-based indices, original order. */
  def toSparse(dense: Column, eps: Double): Column = {
    val pairs = filter(
      transform(dense, (x, i) => struct(i.as("idx"), x.as("v"))),
      s => abs(s.getField("v")) >= lit(eps))
    struct(
      transform(pairs, _.getField("idx")).as("indices"),
      transform(pairs, _.getField("v")).as("values"))
  }

  /** Densify back to a fixed dimension (missing slots are 0.0f) — native
    * O(dim + nnz) scatter per row. */
  def toDense(sparse: Column, dim: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SparseToDense(org.apache.spark.sql.graft.ColumnBridge.expression(sparse), dim))

  /** Σ vᵢ² of the sparse values in double — the self-dot of the
    * sparsified vector (sequential left-to-right accumulation, the
    * oracle-portable order). */
  def sparseSelfDot(sparse: Column): Column =
    aggregate(sparse.getField("values"), lit(0.0),
      (s, x) => s + x.cast("double") * x.cast("double"))

  /** Number of stored elements. */
  def nnz(sparse: Column): Column = size(sparse.getField("indices"))
}

/** One-pass sparse→dense scatter: zero-fill dim slots, then write each
  * stored (index, value) pair. Out-of-range indices are ignored (the
  * producing side never emits them); on duplicate indices the last write
  * wins. Codegen emits a static call, same pattern as the other native
  * kernels. */
case class SparseToDense(child: Expression, dim: Int) extends UnaryExpression {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SparseToDense.compute(input.asInstanceOf[InternalRow], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SparseToDense.compute($c, $dim)")

  override def prettyName: String = "sparse_to_dense"
  override protected def withNewChildInternal(c: Expression): SparseToDense =
    copy(child = c)
}

object SparseToDense {
  /** Static kernel: input struct ordinals are (0: indices array<int>,
    * 1: values array<float>) as built by SparseVectors.toSparse. */
  def compute(s: InternalRow, dim: Int): ArrayData = {
    val idx = s.getArray(0)
    val vals = s.getArray(1)
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) { out(i) = 0.0f; i += 1 }
    val n = idx.numElements()
    var j = 0
    while (j < n) {
      val k = idx.getInt(j)
      if (k >= 0 && k < dim) out(k) = vals.getFloat(j)
      j += 1
    }
    new GenericArrayData(out)
  }
}
