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
  * reducers instead of one. Salt assignment hashes the whole row
  * (xxhash64), keeping the operator deterministic — re-runs produce the
  * same partitioning, unlike rand()-based salting.
  */
object Salting {

  /** Inner equi-join of a skewed `big` side with a replicated `small`
    * side on `key`. Result is row-identical to `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 numSalts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(numSalts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until numSalts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
