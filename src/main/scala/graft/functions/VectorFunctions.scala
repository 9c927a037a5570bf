package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math as pure column expressions (no UDFs).
  *
  * The reference delegates all of this to Pinecone — the metric is declared
  * (cosine, with euclidean/dotproduct as documented alternatives, reference
  * `upsert/upsert.go:27`, `main.go:28`) but never computed locally. Here each
  * metric is a higher-order-function expression over `array<float>` columns,
  * so it runs inside Catalyst with no serialization boundary and stays
  * oracle-portable (DuckDB computes the same arithmetic).
  *
  * All arithmetic is done in double (cast per element) regardless of the
  * array's element type: float-width accumulation would diverge between
  * engines and lose precision at dimension 1536.
  */
object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Σ aᵢ·bᵢ — sequential left-to-right accumulation in double. Native
    * codegen expression ([[DotProduct]]); value-identical to the
    * higher-order form `aggregate(zip_with(a,b,(x,y)->x*y),0D,+)` but runs
    * as a primitive loop instead of interpreted lambdas. */
  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  /** √(Σ aᵢ²) — native codegen expression ([[L2Norm]]). */
  def l2Norm(a: Column): Column =
    toCol(L2Norm(toExpr(a)))

  /** Cosine similarity (the reference's index metric, `upsert/upsert.go:27`).
    * Cosine against a zero vector is defined as 0 — under ANSI mode the
    * bare division would throw DIVIDE_BY_ZERO (hit by embedding an empty
    * query string); the guard never fires for nonzero vectors so oracle
    * values are unaffected. */
  def cosineSim(a: Column, b: Column): Column =
    cosineSimPrenormed(dotProduct(a, b), l2Norm(a), l2Norm(b))

  /** Cosine given a precomputed norm for each side — the scale path: an
    * index table stores `norm` once so each scored pair costs one dot
    * product, not three array passes. */
  def cosineSimPrenormed(dot: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    when(denom === 0.0, lit(0.0)).otherwise(dot / denom)
  }

  /** Euclidean distance (documented alternative metric, `upsert/upsert.go:27`). */
  def l2Dist(a: Column, b: Column): Column =
    toCol(L2Distance(toExpr(a), toExpr(b)))

  /** Unit-normalize a vector (array<double>; zero vectors pass through as
    * zeros). Native one-pass expression — the declarative transform form
    * re-evaluates the norm per element. */
  def normalize(a: Column): Column =
    toCol(L2Normalize(toExpr(a)))
}
