package graft

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers

/** ScalaCheck properties from SURVEY.md §5.2: generated inputs pushed
  * through the REAL column expressions (one local Spark job per generated
  * case, not reimplementations of the formulas). Generators are driven
  * directly with deterministic seeds — the scalatest/scalacheck bridge
  * artifact is not in the offline dependency set.
  */
class PropertySpec extends SparkSpecBase with Matchers {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-10f, 10f)).suchThat(_.exists(_ != 0f))

  private def pairDf(a: Seq[Float], b: Seq[Float]) = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = false)),
      StructField("b", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(java.util.Arrays.asList(Row(a, b)), schema)
  }

  test("property: cosine is symmetric and bounded in [-1, 1]") {
    samples(Gen.zip(vecGen, vecGen), 8).foreach { case (a, b) =>
      val r = pairDf(a, b).select(
        VectorFunctions.cosineSim(col("a"), col("b")),
        VectorFunctions.cosineSim(col("b"), col("a"))).head()
      r.getDouble(0) shouldBe r.getDouble(1) +- 1e-12
      r.getDouble(0) should (be >= -1.0 - 1e-9 and be <= 1.0 + 1e-9)
    }
  }

  test("property: cosine(v, v) = 1 for nonzero v") {
    samples(vecGen, 8).foreach { a =>
      pairDf(a, a).select(VectorFunctions.cosineSim(col("a"), col("b")))
        .head().getDouble(0) shouldBe 1.0 +- 1e-9
    }
  }

  test("property: chat format->parse round-trip for generated senders/messages") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val message = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    samples(Gen.zip(word, message), 12).foreach { case (sender, msg) =>
      val line = s"[09.09.23, 14:35:02] ~ $sender: $msg"
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(line)),
        StructType(Seq(StructField("text", StringType))))
      val r = df.select(
        TextFunctions.chatMessage(col("text")),
        TextFunctions.chatSender(col("text"))).head()
      r.getString(0) shouldBe msg
      r.getString(1) shouldBe sender
    }
  }

  test("property: fingerprint equality <=> normalized-text equality") {
    val text = Gen.listOfN(6, Gen.oneOf("a", "bb", "c d", " ", "\t")).map(_.mkString(" "))
    samples(Gen.zip(text, text), 16).foreach { case (t1, t2) =>
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(t1, t2)),
        StructType(Seq(StructField("x", StringType), StructField("y", StringType))))
      val r = df.select(
        TextFunctions.fingerprint(col("x")), TextFunctions.fingerprint(col("y")),
        TextFunctions.normalizeText(col("x")), TextFunctions.normalizeText(col("y"))).head()
      (r.getString(0) == r.getString(1)) shouldBe (r.getString(2) == r.getString(3))
    }
  }

  test("property: top-K is a prefix of top-(K+1) for varying K") {
    val emb = Tables.embeddings(spark, sfDir)
    val index = graft.operators.KnnSearch.withNorm(emb)
    val q = emb.filter(col("vec_id") === 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val results = (1 to 8).map(k =>
      graft.operators.KnnSearch.topK(index, q, k)
        .select("vec_id").collect().map(_.getLong(0)).toSeq)
    results.sliding(2).foreach { case Seq(smaller, larger) =>
      larger.take(smaller.length) shouldBe smaller
    }
  }

  test("property: CharEntropy kernel matches a naive reference on generated strings") {
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', 'é', '中', '!')))
      .map(_.mkString)
    samples(strGen, 40).filter(_.nonEmpty).foreach { str =>
      val row = graft.functions.CharEntropy.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(str))
      val cps = str.codePoints().toArray
      val counts = cps.groupBy(identity).view.mapValues(_.length.toLong).toMap
      row.getLong(0) shouldBe cps.length.toLong
      row.getLong(1) shouldBe counts.size.toLong
      // fold the naive sum in the SAME ascending-codepoint order
      val expected = counts.toSeq.sortBy(_._1)
        .foldLeft(0.0) { case (acc, (_, c)) => acc + c * math.log(c.toDouble) }
      row.getDouble(2) shouldBe expected // bit-exact: same fold order
      // entropy bounds: 0 <= H <= ln(distinct)
      val h = math.log(cps.length.toDouble) - row.getDouble(2) / cps.length
      h should (be >= -1e-9 and be <= math.log(counts.size.toDouble) + 1e-9)
    }
  }

  test("property: aHash is deterministic and identical bytes hash identically") {
    val bytesGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    val codec1 = new graft.operators.Multimodal.ImageIoCodec
    val codec2 = new graft.operators.Multimodal.ImageIoCodec
    samples(bytesGen, 20).foreach { bytes =>
      val h1 = graft.operators.Multimodal.ahash64(codec1, bytes)
      val h2 = graft.operators.Multimodal.ahash64(codec2, bytes)
      h1 shouldBe h2 // no per-codec-instance state may leak into the hash
    }
  }

  test("property: bpe merge preserves concatenation and leaves no adjacent pair") {
    import org.apache.spark.unsafe.types.UTF8String
    val sym = Gen.oneOf("a", "b", "c", "ab")
    val seqGen = Gen.listOfN(12, sym)
    samples(seqGen, 30).foreach { syms =>
      val in = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        syms.map(UTF8String.fromString).toArray[Any])
      val out = graft.functions.BpeMergePair.compute(in,
        UTF8String.fromString("a"), UTF8String.fromString("b"))
      val outSyms = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      // the concatenated text is invariant under merging
      outSyms.mkString shouldBe syms.mkString
      // no adjacent (a, b) survives (merging creates "ab", never a bare "a")
      outSyms.zip(outSyms.drop(1)).foreach { p => p should not be ("a", "b") }
    }
  }

  test("property: md5_prefix48 equals the declarative conv(substring(md5)) form") {
    // the scaladoc's value-identity claim IS the oracle-parity contract
    // for every hash-gated decision (splits, shards, mixing, MinHash) —
    // pin it on generated strings including unicode and empties
    import org.apache.spark.sql.functions._
    val sGen = Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""), Gen.const("naïve → 中文 🙂"),
      Gen.listOfN(64, Gen.choose(' ', '~')).map(_.mkString))
    samples(sGen, 24).foreach { s =>
      val df = spark.range(1).select(lit(s).as("s"))
      val r = df.select(
        graft.operators.Dedup.hash48(col("s")),
        conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long")).head()
      r.getLong(0) shouldBe r.getLong(1)
    }
  }

  test("property: fixed-point covariance matches a naive double computation") {
    import org.apache.spark.sql.functions._
    val dim = 6
    val vecsGen = Gen.listOfN(30, Gen.listOfN(dim, Gen.chooseNum(-1f, 1f)))
    samples(vecsGen, 4).foreach { vecs =>
      val tmpPath = java.nio.file.Files.createTempDirectory("cov")
      val tmp = tmpPath.toString
      import spark.implicits._
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, 0L, v) }
        .toDF("vec_id", "label", "embedding")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<float>").as("embedding"))
        .write.parquet(tmp + "/embeddings.parquet")
      val got = graft.operators.EmbedPca.covariance(spark, tmp).collect()
        .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpPath).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      val n = vecs.length
      for (i <- 0 until dim; j <- i until dim) {
        val sx = vecs.map(_(i).toDouble).sum
        val sy = vecs.map(_(j).toDouble).sum
        val sxy = vecs.map(v => v(i).toDouble * v(j).toDouble).sum
        val naive = sxy / n - (sx / n) * (sy / n)
        // 1e-12-scale quantization + round-6 output: half-ulp of the
        // 6th decimal plus the fixed-point error envelope
        got((i, j)) shouldBe naive +- 5.1e-7
      }
    }
  }

  test("property: k-anonymity ladder releases no group under k and preserves totals") {
    import spark.implicits._
    val groupGen = Gen.listOfN(12, Gen.zip(
      Gen.oneOf("en", "fr", "de"), Gen.choose(0, 7), Gen.chooseNum(1L, 12L)))
    samples(Gen.zip(groupGen, Gen.chooseNum(2, 9)), 6).foreach { case (raw, k) =>
      // distinct (lang, source) keys — collapse duplicates like a real group frame
      val groups = raw.groupBy(g => (g._1, s"s${g._2}"))
        .map { case ((l, s), gs) => (l, s, gs.map(_._3).sum) }.toSeq
      val out = graft.operators.CorpusOps.kAnonymize(
        groups.toDF("lang", "source", "n"), k).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // totals preserved across release + generalization + suppression
      out.map(_._3).sum shouldBe groups.map(_._3).sum
      // every identifiable (non-suppressed) row satisfies the floor
      out.filter(_._1 != "*").foreach(r => r._3 should be >= k.toLong)
      // at most one fully-suppressed accounting row
      out.count(r => r._1 == "*" && r._2 == "*") should be <= 1
    }
  }

  test("property: pq_encode agrees with an independent per-subspace argmin") {
    val m = 2; val k = 4; val subDim = 3
    val cbGen = Gen.listOfN(m * k * subDim, Gen.chooseNum(-5.0, 5.0))
    val vGen = Gen.listOfN(m * subDim, Gen.chooseNum(-5.0, 5.0))
    samples(Gen.zip(cbGen, vGen), 20).foreach { case (cb, v) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(x => x: Any).toArray)
      val code = graft.functions.PqEncode.compute(arr, isFloat = false,
        cb.toArray, m, k, subDim)
      (0 until m).foreach { mm =>
        val dists = (0 until k).map { kk =>
          (0 until subDim).map { d =>
            val x = v(mm * subDim + d) - cb((mm * k + kk) * subDim + d)
            x * x
          }.sum
        }
        // strict-< argmin keeps the LOWEST id on ties (same rule as the kernel)
        val expected = dists.zipWithIndex.minBy { case (dd, i) => (dd, i) }._2
        code.getByte(mm).toInt shouldBe expected
      }
    }
  }
}
