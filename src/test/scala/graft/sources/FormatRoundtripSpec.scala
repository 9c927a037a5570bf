package graft.sources

import java.nio.file.{Files, Paths}

import graft.{SparkSpecBase, Tables}
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The JSON-lines / ORC sink-source pairs. The full-fidelity hash gate
  * is the driver's (q_json_roundtrip / q_orc_roundtrip oracle-compare);
  * here: row-level losslessness vs the parquet original, create-once
  * steady state, and the FAILFAST corruption contract the scaladoc
  * promises. */
class FormatRoundtripSpec extends SparkSpecBase with Matchers {

  test("json roundtrip is row-identical to the parquet original") {
    val back = FormatRoundtrip.jsonRoundtrip(spark, sfDir)
    val orig = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    back.count() shouldBe orig.count()
    // exceptAll both ways = multiset equality, text bytes included
    back.exceptAll(orig).count() shouldBe 0L
    orig.exceptAll(back).count() shouldBe 0L
  }

  test("orc roundtrip preserves timestamps, doubles, and props exactly") {
    val back = FormatRoundtrip.orcRoundtrip(spark, sfDir)
    val orig = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    back.exceptAll(orig).count() shouldBe 0L
    orig.exceptAll(back).count() shouldBe 0L
  }

  test("export is create-once: second run reuses the written files") {
    FormatRoundtrip.jsonRoundtrip(spark, sfDir).count()
    val ok = FormatRoundtrip.exportPath(sfDir, "json").resolve("_ok")
    val before = Files.getLastModifiedTime(ok)
    FormatRoundtrip.jsonRoundtrip(spark, sfDir).count()
    Files.getLastModifiedTime(ok) shouldBe before
  }

  test("explicit-superset-schema read equals the mergeSchema migration probe") {
    val declared = FormatRoundtrip.schemaEvolution(spark, sfDir)
    // the expensive every-footer reconciliation must agree with the O(1)
    // declared-schema read (modulo column order, which merge derives
    // from footer encounter order)
    val path = FormatRoundtrip.exportPath(sfDir, "evolve")
      .resolve("data").toString
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    declared.exceptAll(merged).count() shouldBe 0L
    merged.exceptAll(declared).count() shouldBe 0L
    // pre-evolution rows surface the added column as null
    val split = FormatRoundtrip.evolutionSplit(spark, sfDir)
    declared.filter(col("doc_id") < split)
      .filter(col("n_chars").isNotNull).count() shouldBe 0L
    declared.filter(col("doc_id") >= split)
      .filter(col("n_chars").isNull).count() shouldBe 0L
  }

  test("a corrupt json line fails the read loudly (FAILFAST), not as nulls") {
    val dir = Files.createTempDirectory("fmt-corrupt")
    Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |{"doc_id": oops not json
        |""".stripMargin)
    val read = spark.read.schema(FormatRoundtrip.DocumentsSchema)
      .option("mode", "FAILFAST").json(dir.toString)
    intercept[SparkException](read.collect())
  }
}
