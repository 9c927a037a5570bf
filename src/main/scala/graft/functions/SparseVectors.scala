package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sparse vector representation — the reference's wire schema carries
  * parallel `indices`/`values` arrays next to the dense values
  * (`main.go:45-48`, deserialized but never produced by the reference
  * itself). SURVEY.md §1.2 maps it to
  * `struct<indices: array<int>, values: array<float>>`; these are the
  * producing/consuming column operators.
  *
  * All are per-row projections (no shuffle); the HOF lambdas are fine
  * here — sparsification is a declared-surface operator, not the scoring
  * hot path (which stays on the dense codegen kernels).
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

  /** Densify back to a fixed dimension (missing slots are 0.0f). */
  def toDense(sparse: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      coalesce(
        element_at(
          map_from_arrays(sparse.getField("indices"), sparse.getField("values")),
          i),
        lit(0.0f)))

  /** Σ vᵢ² of the sparse values in double — the self-dot of the
    * sparsified vector (sequential left-to-right accumulation, the
    * oracle-portable order). */
  def sparseSelfDot(sparse: Column): Column =
    aggregate(sparse.getField("values"), lit(0.0),
      (s, x) => s + x.cast("double") * x.cast("double"))

  /** Number of stored elements. */
  def nnz(sparse: Column): Column = size(sparse.getField("indices"))
}
