package graft.functions

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.matchers.should.Matchers

/** Every native expression must EXECUTE its generated code — Spark
  * silently falls back to interpreted eval when Janino compilation fails
  * (round-1 lesson: an `ev.isNull` assignment on a non-nullable expression
  * compiled fine in Scala and died only inside Janino, leaving a
  * log-warning-only 10× regression). `factoryMode=CODEGEN_ONLY` +
  * `codegen.fallback=false` turn that silent fallback into a test failure,
  * and the NO_CODEGEN comparison pins value-equality of the two paths. */
class CodegenOnlySpec extends SparkSpecBase with Matchers {

  private def withMode[T](mode: String)(f: => T): T = {
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val fb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f finally {
      fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      fb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  private def textExprs: DataFrame =
    Tables.documents(spark, sfDir).limit(50)
      .select(
        col("doc_id"),
        ColumnBridge.column(Md5Prefix48(ColumnBridge.expression(col("text")))).as("md5p"),
        ColumnBridge.column(WordNGramShingles(ColumnBridge.expression(col("text")), 3)).as("shingles"),
        ColumnBridge.column(WordNGramShingles(ColumnBridge.expression(col("text")), 2,
          distinct = false)).as("bigram_stream"),
        ColumnBridge.column(FeatureHashEmbed(ColumnBridge.expression(col("text")), 16)).as("emb"),
        ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(col("text")), 5, 4)).as("winnow"),
        ColumnBridge.column(CharEntropy(ColumnBridge.expression(col("text")))).as("entropy_stats"),
        ColumnBridge.column(DeflateStats(ColumnBridge.expression(col("text")))).as("deflate_stats"),
        ColumnBridge.column(BpeMergePair(ColumnBridge.expression(
          split(col("text"), "")), "e", "r")).as("bpe_merged"))
      .orderBy(col("doc_id"))

  private def vectorExprs: DataFrame =
    Tables.embeddings(spark, sfDir).limit(50)
      .select(
        col("vec_id"),
        VectorFunctions.normalize(col("embedding")).as("unit"),
        VectorFunctions.dotProduct(col("embedding"), col("embedding")).as("selfdot"),
        VectorFunctions.l2Norm(col("embedding")).as("norm"),
        VectorFunctions.l2Dist(col("embedding"), col("embedding")).as("selfdist"),
        SparseVectors.toDense(SparseVectors.toSparse(col("embedding"), 0.05), 64).as("sparse_rt"),
        PqEncode.encode(VectorFunctions.normalize(col("embedding")),
          Array.tabulate(8 * 16 * 8)(i => (i % 97) * 0.01), 8, 16, 8).as("pq_code"))
      .orderBy(col("vec_id"))

  test("all native expressions execute under CODEGEN_ONLY and match interpreted eval") {
    val gen = withMode("CODEGEN_ONLY") {
      (textExprs.collect().map(_.toString), vectorExprs.collect().map(_.toString))
    }
    val interp = withMode("NO_CODEGEN") {
      (textExprs.collect().map(_.toString), vectorExprs.collect().map(_.toString))
    }
    gen._1 shouldBe interp._1
    gen._2 shouldBe interp._2
    gen._1.length shouldBe 50
  }
}
