package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's CSV embedding sink/source pair, distributed.
  *
  * Sink (reference `embed/embed.go:120-126`): one vector per line as
  * decimal strings at `%f` precision — 6 decimals (`embed/embed.go:144`),
  * a real precision loss the reference takes on every row. We prepend the
  * vector id so the roundtrip is keyed (the reference instead re-derives
  * ids from line numbers, `upsert/upsert.go:170`, which silently reorders
  * under any parallel write).
  *
  * Source (reference `upsert/upsert.go:148-165`): split + cast. A
  * malformed float becomes NULL in that element — *intended* semantics;
  * the reference's bug B7 (`upsert/upsert.go:163`) leaves a silent 0.0 in
  * the vector instead.
  *
  * The reference also suffixes sink files with a wall-clock timestamp that
  * the reader never looks for (bug B5, `embed/embed.go:68-71` vs
  * `main.go:291`); here the path is the contract.
  */
object EmbeddingsCsv {

  def write(emb: DataFrame, path: String): Unit =
    emb.select(
        // an empty (or null) vector writes the bare id — a trailing comma
        // would read back as a 1-element [null] vector, not []
        when(size(col("embedding")) > 0,
          concat_ws(",",
            col("vec_id").cast("string"),
            concat_ws(",", transform(col("embedding"),
              x => format_string("%.6f", x.cast("double"))))))
          .otherwise(col("vec_id").cast("string")).as("value"))
      .write.mode("overwrite").text(path)

  def read(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), ",")
    spark.read.text(path)
      .select(
        // try_cast like the elements: a malformed/foreign id line becomes
        // a NULL id instead of failing the whole read under ANSI mode
        element_at(parts, 1).try_cast("long").as("vec_id"),
        transform(slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
          s => s.try_cast("float")).as("embedding"))
  }
}
