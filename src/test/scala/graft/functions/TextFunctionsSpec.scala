package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

class TextFunctionsSpec extends SparkSpecBase with Matchers {
  import TextFunctions._

  private def one(line: String) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(line)),
      StructType(Seq(StructField("text", StringType))))
  }

  /** The documented chat format, reference `main.go:32`. */
  val docLine = "[09.09.23, 14:35:02] ~ john_doe: Hello world!"

  test("chatMessage strips the documented prefix (intended semantics, not bug B1)") {
    // The reference's own regex (embed/embed.go:98) would extract only
    // `[09.09.23,` from this line — B1 in SURVEY.md. We implement intent.
    one(docLine).select(chatMessage(col("text"))).head().getString(0) shouldBe
      "Hello world!"
  }

  test("chatSender and chatTimestamp extract typed prefix fields") {
    val r = one(docLine)
      .select(chatSender(col("text")), chatTimestamp(col("text")).cast("string"))
      .head()
    r.getString(0).trim shouldBe "~ john_doe".replace("~ ", "") // sender without marker
    r.getString(1) shouldBe "2023-09-09 14:35:02"
  }

  test("lines without a prefix pass through whole (B2 documented: ref embeds them too)") {
    one("just a plain message").select(chatMessage(col("text")))
      .head().getString(0) shouldBe "just a plain message"
    one("just a plain message").select(hasChatPrefix(col("text")))
      .head().getBoolean(0) shouldBe false
  }

  test("Hebrew / RTL text survives parsing and normalization (main.go:34-37)") {
    val heb = "[09.09.23, 14:35:02] ~ יוסי: שלום   עולם"
    val r = one(heb).select(normalizeText(chatMessage(col("text")))).head().getString(0)
    r shouldBe "שלום עולם"
  }

  test("normalizeText collapses whitespace runs and trims") {
    one("  a\n\nb\t c  ").select(normalizeText(col("text")))
      .head().getString(0) shouldBe "a b c"
  }

  test("tokenCount handles empty and multi-space text") {
    one("").select(tokenCount(col("text"))).head().getInt(0) shouldBe 0
    one("a  b   c").select(tokenCount(col("text"))).head().getInt(0) shouldBe 3
  }

  test("langIdHeuristic discriminates real multilingual text") {
    val cases = Seq(
      "这是一个中文句子，用于测试语言识别。" -> "zh",
      "שלום עולם זהו משפט בעברית לבדיקה" -> "he",
      "Die schöne Straße führt über die Brücke" -> "de",
      "El niño comió mañana y después durmió" -> "es",
      "the quick brown fox jumps over the lazy dog" -> "en")
    cases.foreach { case (text, expected) =>
      one(text).select(langIdHeuristic(col("text"))).head().getString(0) shouldBe expected
    }
  }

  test("fingerprint is whitespace-insensitive but content-sensitive") {
    val a = one("hello   world").select(fingerprint(col("text"))).head().getString(0)
    val b = one("hello world").select(fingerprint(col("text"))).head().getString(0)
    val c = one("hello worlds").select(fingerprint(col("text"))).head().getString(0)
    a shouldBe b
    a should not be c
  }

  test("winnowing guarantee: docs sharing a substring of k+w-1 chars share a fingerprint") {
    import org.apache.spark.sql.graft.ColumnBridge
    val fp = (s: String) => {
      ColumnBridge // two docs with a long shared middle, different ends
      one(s).select(ColumnBridge.column(
        graft.functions.WinnowFingerprints(ColumnBridge.expression(col("text")), 5, 4)))
        .head().getSeq[Long](0).toSet
    }
    val shared = "the quick brown fox jumps over the lazy dog"
    val a = fp("AAAA " + shared + " BBBB")
    val b = fp("CCCC " + shared + " DDDD")
    a.intersect(b) should not be empty
    // and disjoint texts share nothing
    fp("abcdefghijklmnop").intersect(fp("qrstuvwxyz012345")) shouldBe empty
    // shorter than k -> empty set
    fp("abc") shouldBe empty
  }

  test("qualityScore stays within [0,1]") {
    val docs = graft.Tables.documents(spark, sfDir)
    val mm = docs.select(min(qualityScore(col("text"))), max(qualityScore(col("text")))).head()
    mm.getDouble(0) should be >= 0.0
    mm.getDouble(1) should be <= 1.0
  }
}
