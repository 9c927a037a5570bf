package graft.operators

import graft.SparkSpecBase
import org.scalatest.matchers.should.Matchers

/** BM25 semantics against a hand-computed miniature corpus: the Spark
  * pipeline must reproduce the textbook formula exactly (the oracle proves
  * engine parity; this proves the FORMULA is the one intended). */
class Bm25Spec extends SparkSpecBase with Matchers {

  test("bm25 scores match a hand-rolled computation on a 3-doc corpus") {
    import spark.implicits._
    // doc 1: 'vector' x2 of 4 tokens; doc 2: 'vector' 'hash' of 3;
    // doc 3: none of the query terms
    val docs = Seq(
      (1L, "vector vector scan table"),
      (2L, "vector hash scan"),
      (3L, "scan table merge")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("mini_docs")

    // reference computation, plain Scala
    val n = 3.0
    val avgdl = (4 + 3 + 3) / 3.0
    def idf(df: Int): Double = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Int, dl: Int, df: Int): Double =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expected = Map(
      1L -> (term(2, 4, 2) /* vector, df=2 */ + 0.0),
      2L -> (term(1, 3, 2) /* vector */ + term(1, 3, 1) /* hash, df=1 */))

    // drive the production pipeline over the miniature corpus by pointing
    // Tables.documents at a temp parquet copy
    val tmp = java.nio.file.Files.createTempDirectory("bm25").toString
    docs.write.parquet(tmp + "/documents.parquet")
    val out = TextOps.bm25(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    out.keySet shouldBe Set(1L, 2L) // doc 3 matches no term
    out(1L) shouldBe expected(1L) +- 1e-6
    out(2L) shouldBe expected(2L) +- 1e-6
    // more query-term mass ranks higher
    out(2L) should be > out(1L)
  }
}
