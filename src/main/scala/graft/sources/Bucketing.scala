package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) storage — pre-shuffled tables so repeated joins
  * and aggregations on the bucket key need NO exchange at read time.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every join and shuffling it once at write: both sides bucketed by the
  * join key into the same bucket count join with zero Exchange in the
  * plan (verified in tests). Spark's bucketing requires the table
  * catalog (`saveAsTable`), matching bucket counts, and
  * `spark.sql.sources.bucketing.enabled` (default true).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
