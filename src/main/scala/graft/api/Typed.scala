package graft.api

import graft.Tables
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` edge of the engine (SURVEY.md §1.3: DataFrames
  * internally — dynamic schema, oracle-comparable — case classes at the
  * API boundary where compile-time field checks help callers).
  */
object Typed {

  /** The engine's logical row types (testdata schemas, SURVEY.md §1.3). */
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    implicit val enc: Encoder[Document] = Encoders.product[Document]
    Tables.documents(spark, sfDir).as[Document]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    implicit val enc: Encoder[Embedding] = Encoders.product[Embedding]
    Tables.embeddings(spark, sfDir).as[Embedding]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    implicit val enc: Encoder[Event] = Encoders.product[Event]
    Tables.events(spark, sfDir).as[Event]
  }

  /** Element-wise mean of a group of vectors as a typed
    * `Aggregator[IN, BUF, OUT]` (SURVEY.md §2.10) — the centroid update
    * step of k-means. The buffer is (running sums, count); merge is
    * element-wise, so partial aggregation combines map-side exactly like
    * any built-in agg. */
  class VectorMean(dim: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      // fail loudly on a dimension mismatch (the VectorExprUtil
      // requireSameLength discipline) — silently truncating/zero-padding
      // would return a plausible-looking mean diluted toward zero
      if (v.length != dim) throw new IllegalArgumentException(
        s"VectorMean($dim): vector of length ${v.length}")
      val (sums, n) = b
      var i = 0
      while (i < dim) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }

    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

    override def finish(b: (Array[Double], Long)): Array[Float] = {
      val (sums, n) = b
      if (n == 0) new Array[Float](dim)
      else sums.map(s => (s / n).toFloat)
    }

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }
}
