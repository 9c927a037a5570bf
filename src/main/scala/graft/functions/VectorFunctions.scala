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
  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ — sequential left-to-right accumulation in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (s, x) => s + x)

  /** √(Σ aᵢ²) */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (s, x) => s + d(x) * d(x)))

  /** Cosine similarity (the reference's index metric, `upsert/upsert.go:27`). */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine given a precomputed norm for each side — the scale path: an
    * index table stores `norm` once so each scored pair costs one dot
    * product, not three array passes. */
  def cosineSimPrenormed(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  /** Euclidean distance (documented alternative metric, `upsert/upsert.go:27`). */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (s, x) => s + x))

  /** Unit-normalize a vector (kept as array<double>). */
  def normalize(a: Column): Column = {
    transform(a, x => d(x) / l2Norm(a))
  }
}
