package graft.sources

import graft.SparkSpecBase
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Gates for the multi-term expansion queries (q_bm25_prefix,
  * q_bm25_fuzzy — Lucene PrefixQuery/FuzzyQuery re-expressed as a
  * scoring boolean over dictionary expansions) and the positional
  * highlighter (q_highlight). The raw-text score parity is the driver
  * oracle's business; these specs gate the EXPANSION step (dict-derived
  * set == corpus truth), the guard rails (maxClauseCount cap, empty
  * expansion), the degeneration theorems (a 1-term expansion ranks like
  * the plain scorer; an exact fuzzy match carries boost 1.0), tombstone
  * masking, and the snippet contract (anchored at the true first match,
  * window-bounded, equal to the raw-text token slice). */
class LexicalExpansionSpec extends SparkSpecBase with Matchers {

  private def corpusWords: Set[String] =
    graft.Tables.documents(spark, sfDir)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet

  test("prefix expansion equals the raw-text vocabulary's prefix subset") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val got = InvertedIndex.expandPrefix(spark, layout, InvertedIndex.PrefixQ)
    got.toSet shouldBe corpusWords.filter(_.startsWith(InvertedIndex.PrefixQ))
    got should not be empty
    got shouldBe got.sorted // deterministic order for the boost frame
  }

  test("fuzzy expansion matches a raw-text levenshtein referee, boosts included") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val got = InvertedIndex.expandFuzzy(
      spark, layout, InvertedIndex.FuzzyQ, InvertedIndex.FuzzyMaxEdits)
    // independent referee: plain-Scala edit distance over the corpus vocab
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val q = InvertedIndex.FuzzyQ
    val expect = corpusWords.toSeq
      .map(w => (w, lev(w, q)))
      .filter(_._2 <= InvertedIndex.FuzzyMaxEdits)
      .sortBy(_._1)
      .map { case (w, d) =>
        (w, 1.0 - d.toDouble / math.min(w.length, q.length).toDouble)
      }
    got shouldBe expect
    // the declared typo exercises the boost: ≥2 matches at ≥2 distances
    got.map(_._2).distinct.size should be >= 2
  }

  test("an exact dictionary hit carries boost 1.0 (distance 0)") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val got = InvertedIndex.expandFuzzy(spark, layout, "vector", 1)
    got.find(_._1 == "vector").map(_._2) shouldBe Some(1.0)
  }

  test("the maxClauseCount cap fails loudly, naming the expansion size") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.expandPrefix(spark, layout, "", cap = 3)
    }
    e.getMessage should include("> 3")
    val e2 = intercept[IllegalArgumentException] {
      InvertedIndex.expandFuzzy(spark, layout, "hash", 4, cap = 1)
    }
    e2.getMessage should include("maxClauseCount")
  }

  test("prefix expansion is partition-pruned on the lex sidecar; fuzzy reads only its deletion variants' buckets") {
    import org.apache.spark.sql.functions.col
    val layout = InvertedIndex.ensure(spark, sfDir)
    val pf = InvertedIndex.prefixCandidates(spark, layout, "se")
    pf.collect()
    val plan = pf.queryExecution.executedPlan.toString
    // the p2 partition column exists only on the dictlex sidecar, so a
    // StartsWith partition filter on it proves both the source and the
    // pruning (the scan's Location string is elided in plan text)
    plan should include("PartitionFilters")
    plan should include("StartsWith(p2")
    // fuzzy: the deletion-neighborhood path — the scan carries a
    // PartitionFilter on vbucket (a column only the dictdel sidecar has)
    // and a pushed membership filter on the variant key, so the read is
    // ∝ the typo's own neighborhood, never the vocabulary or a band
    val fz = InvertedIndex.fuzzyCandidates(
      spark, layout, InvertedIndex.FuzzyQ, InvertedIndex.FuzzyMaxEdits)
    fz.collect()
    val fplan = fz.queryExecution.executedPlan.toString
    fplan should include("PartitionFilters")
    fplan should include("vbucket")
    fplan should include regex "PushedFilters: \\[.*In\\(v"
    // the band FALLBACK (legacy layouts / maxEdits > MaxDeletes) keeps
    // its own gate: the length band reaches the lex scan as a PUSHED
    // filter — the levenshtein never evaluates outside |len−|q|| ≤ d
    val fb = InvertedIndex.fuzzyBandCandidates(
      spark, layout, InvertedIndex.FuzzyQ, InvertedIndex.FuzzyMaxEdits)
    fb.collect()
    val bplan = fb.queryExecution.executedPlan.toString
    bplan should include regex "PushedFilters: \\[.*GreaterThanOrEqual\\(len"
    // ... and the band is a real restriction on this corpus, not a no-op
    val lex = spark.read.parquet(InvertedIndex.dictLexPathOf(layout))
    val q = InvertedIndex.FuzzyQ
    val banded = lex.filter(col("len").between(
      q.length - InvertedIndex.FuzzyMaxEdits,
      q.length + InvertedIndex.FuzzyMaxEdits)).count()
    banded should be < lex.count()
    // superset theorem in action: the neighborhood expansion equals the
    // unbanded full-vocabulary referee (the fuzzy referee test above
    // proves the same against raw text; this pins the access path)
    val unbanded = lex
      .filter(org.apache.spark.sql.functions.levenshtein(
        col("w"), org.apache.spark.sql.functions.lit(q)) <=
        InvertedIndex.FuzzyMaxEdits)
      .select(col("w")).collect().map(_.getString(0)).toSet
    InvertedIndex.expandFuzzy(spark, layout, q, InvertedIndex.FuzzyMaxEdits)
      .map(_._1).toSet shouldBe unbanded
  }

  test("wildcard expansion equals the raw-text vocabulary's regex subset; leading wildcard included") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val vocab = corpusWords
    // the declared pattern: both metacharacters, ≥2 matches
    val got = InvertedIndex.expandWildcard(spark, layout, InvertedIndex.WildcardQ)
    got.toSet shouldBe vocab.filter(
      _.matches(InvertedIndex.wildcardRegex(InvertedIndex.WildcardQ)))
    got.size should be >= 2
    // a leading-wildcard pattern (no literal prefix — the documented
    // full lex walk) is still CORRECT
    val lead = InvertedIndex.expandWildcard(spark, layout, "*er")
    lead.toSet shouldBe vocab.filter(_.endsWith("er"))
    lead should not be empty
    // single-? pattern
    InvertedIndex.expandWildcard(spark, layout, "h?sh").toSet shouldBe
      vocab.filter(_.matches("^h.sh$"))
  }

  test("wildcard expansion is prefix-pruned on the lex sidecar when the pattern has a literal prefix") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val wc = InvertedIndex.wildcardCandidates(
      spark, layout, InvertedIndex.WildcardQ)
    wc.collect()
    val plan = wc.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("StartsWith(p2")
    // the regex/LIKE twins agree on the expansion (the oracle contract)
    InvertedIndex.wildcardLike(InvertedIndex.WildcardQ) shouldBe "s%a_"
    // cap discipline holds for wildcard too
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.expandWildcard(spark, layout, "*", cap = 3)
    }
    e.getMessage should include("maxClauseCount")
  }

  test("regexp expansion equals the raw-text vocabulary's anchored-regex subset, prefix-pruned") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val vocab = corpusWords
    val got = InvertedIndex.expandRegex(spark, layout, InvertedIndex.RegexQ)
    got.toSet shouldBe vocab.filter(
      _.matches("^(?:" + InvertedIndex.RegexQ + ")$"))
    got.size should be >= 2 // the alternation genuinely widens the set
    // ANCHORED semantics (Lucene RegexpQuery): a substring-only match is
    // not a match — "can" alone must not admit "scan"
    InvertedIndex.expandRegex(spark, layout, "can").toSet shouldBe
      vocab.filter(_ == "can")
    // a class+quantifier pattern from the shared Java/RE2 subset
    InvertedIndex.expandRegex(spark, layout, "[hj]as?h").toSet shouldBe
      vocab.filter(_.matches("^[hj]as?h$"))
    // literal-prefix pruning reaches the lex scan
    val rc = InvertedIndex.regexCandidates(spark, layout, InvertedIndex.RegexQ)
    rc.collect()
    val plan = rc.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("StartsWith(p2")
  }

  test("fuzzy boosts are clamped at zero for generic inputs (maxEdits >= min term length)") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val got = InvertedIndex.expandFuzzy(spark, layout, "as", 4)
    got should not be empty
    got.foreach { case (_, b) => b should be >= 0.0 }
  }

  test("lex maintenance: upsert adds new keys, vacuum drops dead ones, the audit invariant holds throughout") {
    import spark.implicits._
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "lex-life")
    def lexAudit(): Long = InvertedIndex.auditFrame(spark, layout).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
      .apply("lex_matches_dict")
    val newDoc = Seq((9999999L, "zzznovel zzznovel qqrare"))
      .toDF("doc_id", "text")
    InvertedIndex.upsertDocs(spark, layout, newDoc)
    InvertedIndex.expandPrefix(spark, layout, "zzz") shouldBe Seq("zzznovel")
    lexAudit() shouldBe 0L
    InvertedIndex.deleteDocs(spark, layout, Seq(9999999L).toDF("doc_id"))
    InvertedIndex.vacuum(spark, layout)
    // the novel terms died with their only doc — the lex merge must drop
    // them from their p2 partitions (a stale key would route a prefix
    // query to a term the dict no longer holds)
    InvertedIndex.expandPrefix(spark, layout, "zzz") shouldBe Seq.empty
    InvertedIndex.expandPrefix(spark, layout, "qqrar") shouldBe Seq.empty
    lexAudit() shouldBe 0L
  }

  test("expansion-aware highlighting anchors at the first EXPANDED-term occurrence; prefix-in-phrase contains the exact pair") {
    import org.apache.spark.sql.functions.{col, split, trim}
    val layout = InvertedIndex.ensure(spark, sfDir)
    // winners of the prefix scoring boolean, snippet anchored by the set
    val hp = InvertedIndex.highlightPrefix(spark, sfDir).collect()
    val wins = InvertedIndex.bm25ExpandedOver(spark, layout,
      InvertedIndex.expandPrefix(spark, layout, InvertedIndex.PrefixQ)
        .map((_, 1.0)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    hp.map(r => (r.getLong(0), r.getDouble(1))).toSeq shouldBe wins
    // raw-text referee for the anchor: first token with the prefix
    val toksOf = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    hp.foreach { r =>
      val t = toksOf(r.getLong(0))
      val expect = t.indexWhere(_.startsWith(InvertedIndex.PrefixQ)).toLong
      r.getLong(2) shouldBe expect
      val start = math.max(expect - InvertedIndex.HighlightWindow, 0L).toInt
      r.getString(3) shouldBe
        t.slice(start, start + 2 * InvertedIndex.HighlightWindow + 1).mkString(" ")
    }
    // prefix-in-phrase: the exact (w1, w2) pair is one expansion member,
    // so its per-doc count never exceeds the widened slot's
    val pp = InvertedIndex.phrasePrefix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = InvertedIndex.phraseOver(spark, layout,
      Seq(InvertedIndex.PhraseW1, InvertedIndex.PhraseW2), k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    pp should not be empty
    exact.foreach { case (doc, n) =>
      if (pp.contains(doc)) pp(doc) should be >= n
    }
    // raw-text referee for the widened slot
    pp.foreach { case (doc, n) =>
      val t = toksOf(doc)
      val expect = t.indices.dropRight(1).count(i =>
        t(i) == InvertedIndex.PhraseW1 &&
          t(i + 1).startsWith(InvertedIndex.PhrasePrefixQ))
      n shouldBe expect.toLong
    }
  }

  test("an empty expansion is rejected before scheduling a scoring pass") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    intercept[IllegalArgumentException] {
      InvertedIndex.bm25ExpandedOver(spark, layout, Seq.empty)
    }
  }

  test("1-term degeneration: expanded scoring ranks like the plain scorer") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val exp = InvertedIndex.bm25ExpandedOver(spark, layout, Seq(("vector", 1.0)))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val plain = InvertedIndex.bm25Over(spark, layout, terms = Seq("vector"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    exp.map(_._1).toSeq shouldBe plain.map(_._1).toSeq
    // quantization shifts a score by < 1e-9 before the 6-decimal round
    exp.zip(plain).foreach { case ((_, a), (_, b)) =>
      math.abs(a - b) should be <= 1e-6
    }
  }

  test("tombstone masking: a deleted prefix-winner leaves the expanded ranking") {
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "lexexp-del")
    val terms = InvertedIndex.expandPrefix(spark, layout, InvertedIndex.PrefixQ)
      .map((_, 1.0))
    val before = InvertedIndex.bm25ExpandedOver(spark, layout, terms)
      .collect().map(_.getLong(0)).toSeq
    val victim = before.head
    import spark.implicits._
    InvertedIndex.deleteDocs(spark, layout, Seq(victim).toDF("doc_id"))
    val after = InvertedIndex.bm25ExpandedOver(spark, layout, terms)
      .collect().map(_.getLong(0)).toSeq
    after should not contain victim
    // survivors keep their relative order (scores are per-doc except df —
    // the correction shifts all, order among the old survivors holds here)
    after.filter(before.contains) shouldBe
      before.filter(_ != victim).filter(after.contains)
  }

  test("minimum-should-match: m=1 degenerates to the plain scorer; every winner holds >= m terms; m is monotone") {
    val layout = InvertedIndex.ensure(spark, sfDir)
    val terms = InvertedIndex.MsmTerms
    // m=1 theorem: the >=1-presence gate is exactly the scored-doc set
    InvertedIndex.bm25Msm(spark, layout, terms, 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq shouldBe
      InvertedIndex.bm25Over(spark, layout, terms = terms)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // raw-text referee: every declared winner holds >= MsmMin distinct terms
    val winners = InvertedIndex.bm25MsmIndexed(spark, sfDir)
      .collect().map(_.getLong(0))
    val counts = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(winners: _*))
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id")).agg(countDistinct(col("w")).as("nw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    winners.foreach { id => counts(id) should be >= InvertedIndex.MsmMin.toLong }
    // monotonicity: a stricter gate only removes candidates
    val m3 = InvertedIndex.bm25Msm(spark, layout, terms, 3, k = 500)
      .collect().map(_.getLong(0)).toSet
    val m2 = InvertedIndex.bm25Msm(spark, layout, terms, 2, k = 500)
      .collect().map(_.getLong(0)).toSet
    m3.subsetOf(m2) shouldBe true
    intercept[IllegalArgumentException] {
      InvertedIndex.bm25Msm(spark, layout, terms, terms.size + 1)
    }
  }

  test("serving mode: resident-dict expansion equals stateless and sees an upsert's new term") {
    import spark.implicits._
    val layout = InvertedIndex.cloneIndex(spark, sfDir, "lexexp-serve")
    val before = InvertedIndex.expandPrefix(spark, layout, "s", serving = true)
    before shouldBe InvertedIndex.expandPrefix(spark, layout, "s")
    before should not contain "sensational"
    InvertedIndex.upsertDocs(spark, layout,
      Seq((9100001L, "sensational vector sensational")).toDF("doc_id", "text"))
    // the dict merge moved the shard-inventory stamp: the very NEXT
    // serving request expands over the new vocabulary
    val after = InvertedIndex.expandPrefix(spark, layout, "s", serving = true)
    after should contain("sensational")
    val res = InvertedIndex.bm25ExpandedOver(spark, layout,
      after.map((_, 1.0)), serving = true).collect().map(_.getLong(0))
    res should contain(9100001L)
    // resident and stateless scoring agree bit-for-bit post-upsert
    res.toSeq shouldBe InvertedIndex.bm25ExpandedOver(spark, layout,
      after.map((_, 1.0))).collect().map(_.getLong(0)).toSeq
  }

  test("highlight: winners match bm25, snippets anchor at the true first match") {
    val res = InvertedIndex.highlightIndexed(spark, sfDir).collect()
    val winners = InvertedIndex.bm25Indexed(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    res.map(_.getLong(0)).toSet shouldBe winners.keySet
    // referee: positions + slices recomputed from raw text
    val terms = TextOps.Bm25Terms.toSet
    val texts = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(res.map(_.getLong(0)): _*))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val w = InvertedIndex.HighlightWindow
    res.foreach { r =>
      val (id, score, fp, snip) =
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3))
      score shouldBe winners(id)
      val toks = texts(id).trim.split("\\s+").toSeq
      val expectFp = toks.indexWhere(terms.contains)
      fp shouldBe expectFp.toLong
      val start = math.max(expectFp - w, 0)
      snip shouldBe toks.slice(start, start + 2 * w + 1).mkString(" ")
      terms.exists(snip.split(" ").contains(_)) shouldBe true
    }
  }
}
