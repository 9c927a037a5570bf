package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins (the manual fallback when AQE's skew-join
  * split can't apply — e.g. a skewed key feeding an aggregation, or a
  * build side too large to broadcast).
  *
  * The skewed (big) side spreads each hot key across `numSalts` synthetic
  * sub-keys; the small side is replicated once per salt. The join key
  * becomes (key, salt), so one hot key's rows land on `numSalts`
  * reducers instead of one.
  *
  * The salt MUST be a deterministic function of the row. A positional or
  * random salt (monotonically_increasing_id, rand) is nondeterministic
  * under task retry: if an upstream task is recomputed after a fetch
  * failure, its re-evaluated rows can receive different salts than the
  * shuffle output already consumed downstream, silently duplicating or
  * dropping join rows — the SPARK-23207 class of bug, invisible on a
  * healthy run and corrupting exactly when an executor dies. So the salt
  * here is xxhash64 over the row's content (all columns by default, or a
  * caller-supplied column set, e.g. a unique id): bit-stable across
  * retries, so a recomputed row always lands on the same sub-key.
  *
  * Known limitation of content salting: full-duplicate rows of a hot key
  * hash to ONE salt. If the skew is duplicate-row skew, pass `saltCols`
  * including a column that distinguishes the duplicates (a unique row id
  * from the source, a file+offset column) — never a nondeterministic
  * expression.
  */
object Salting {

  /** Inner equi-join of a skewed `big` side with a replicated `small`
    * side on `key`. Result is row-identical to `big.join(small, key)`.
    *
    * @param saltCols columns the deterministic salt hashes; defaults to
    *                 all of `big`'s columns. Must not contain
    *                 nondeterministic expressions (see class doc). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 numSalts: Int, saltCols: Seq[Column] = Nil): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    val hashed = if (saltCols.nonEmpty) saltCols
    else big.columns.toSeq.map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(hashed: _*), lit(numSalts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until numSalts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
