package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins (the manual fallback when AQE's skew-join
  * split can't apply — e.g. a skewed key feeding an aggregation, or a
  * build side too large to broadcast).
  *
  * The skewed (big) side spreads each hot key across `numSalts` synthetic
  * sub-keys; the small side is replicated once per salt. The join key
  * becomes (key, salt), so one hot key's rows land on `numSalts`
  * reducers instead of one. Salt assignment round-robins a per-row id
  * (monotonically_increasing_id mod numSalts): a row-CONTENT hash would
  * send full-duplicate rows of a hot key — the classic skew case — to
  * ONE salt, silently reproducing the straggler the operator exists to
  * break. The salt only controls placement, never the join result, so
  * the id's run-to-run instability is invisible in the output.
  */
object Salting {

  /** Inner equi-join of a skewed `big` side with a replicated `small`
    * side on `key`. Result is row-identical to `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 numSalts: Int): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until numSalts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
