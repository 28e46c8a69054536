package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId picks the language with most stopword hits") {
    val out = Seq("the fast dog and the slow cat", "el perro y la casa de que orden")
      .toDF("text").select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es"))
  }

  test("char-trigram langId distinguishes language-shaped text") {
    val out = Seq("the thing and the ring", "la casa de que los niños", "xy")
      .toDF("text").select(TextAnalysis.langIdNgram(col("text"))).as[String].collect()
    assert(out(0) == "en" && out(1) == "es")
    assert(out(2) == "en") // < 3 chars: all scores 0, first profile wins
  }

  test("fingerprint matches hand-computed rolling hash") {
    // ((0*31+97)*31+98)*31+99 = 96354
    val h = Seq("abc").toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[Long].head()
    assert(h == 96354L)
  }

  test("fingerprint only reads maxLen prefix") {
    val a = Seq("x" * 64).toDF("text").select(TextAnalysis.fingerprint(col("text"), 64)).as[Long].head()
    val b = Seq("x" * 64 + "DIFFERENT").toDF("text").select(TextAnalysis.fingerprint(col("text"), 64)).as[Long].head()
    assert(a == b)
  }

  test("quality counts chars, words and ratios") {
    val q = Seq("the cat!").toDF("text").select(TextAnalysis.quality(col("text")).as("q"))
      .select("q.n_chars", "q.n_words", "q.punct_ratio_fp4", "q.stopword_ratio_fp4")
      .as[(Int, Long, Long, Long)].head()
    assert(q._1 == 8 && q._2 == 2)
    assert(q._3 == 1250) // 1 punct / 8 chars = 0.125
    assert(q._4 == 5000) // "the" of 2 words
  }

  test("tokenCount splits words, digits and punctuation runs") {
    val n = Seq("ab, cd 9!").toDF("text").select(TextAnalysis.tokenCount(col("text"))).as[Int].head()
    assert(n == 5) // ab , cd 9 !
  }

  test("native graft_trigram_score is bit-identical to the HOF trigramScore on real data") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val profile = TextAnalysis.DefaultTrigramProfiles.head._2
    val both = docs.select(
        call_function("graft_trigram_score", lower(col("text")), array(profile.map(lit): _*)).as("nat"),
        TextAnalysis.trigramScore(col("text"), profile).as("hof"))
      .as[(Int, Int)].collect()
    assert(both.nonEmpty && both.forall { case (n, h) => n == h })
    // short strings and supplementary (non-BMP) codepoints
    val edge = Seq("", "ab", "the", "a😀the😀b").toDF("text")
      .select(
        call_function("graft_trigram_score", lower(col("text")), array(profile.map(lit): _*)),
        TextAnalysis.trigramScore(col("text"), profile))
      .as[(Int, Int)].collect()
    assert(edge.forall { case (n, h) => n == h })
  }

  test("staged langIdDf / langIdNgramDf / qualityDf match the inline forms on real data") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val inlineLang = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("p"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val stagedLang = TextAnalysis.langIdDf(docs, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(stagedLang == inlineLang && stagedLang.nonEmpty)
    val inlineNgram = docs.select(col("doc_id"), TextAnalysis.langIdNgram(col("text")).as("p"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val stagedNgram = TextAnalysis.langIdNgramDf(docs, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(stagedNgram == inlineNgram)
    val inlineQ = docs.select(col("doc_id"), TextAnalysis.quality(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_chars"), col("q.n_words"), col("q.mean_word_len_fp2"),
        col("q.punct_ratio_fp4"), col("q.stopword_ratio_fp4"))
      .as[(Long, Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val stagedQ = TextAnalysis.qualityDf(docs, "doc_id", "text")
      .as[(Long, Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(stagedQ == inlineQ)
  }

  test("normalizeUrl canonicalizes case/www/ports/slash/utm/fragment and edge shapes") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&b=2&a=1#frag" -> "https://example.com/Path?a=1&b=2",
      "http://WWW.site.org:80/a/b//" -> "http://site.org/a/b",
      // non-default port survives; empty query drops the '?'
      "https://example.com:8443/x?utm_only=1" -> "https://example.com:8443/x",
      // root path collapses; params sort; plain http no-www untouched
      "http://example.com/?b=2&a=1" -> "http://example.com?a=1&b=2",
      // :443 on http is NOT a default port — it must survive
      "http://example.com:443/x" -> "http://example.com:443/x",
      // no scheme → prefix extract misses, string passes through lowering-free
      "just-a-string/Path/" -> "just-a-string/Path",
      // fragment-only tail; empty path
      "https://Ex.com#x" -> "https://ex.com",
      "" -> "")
    val df = cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }.toDF("id", "url")
    val got = df.select(col("id"), graft.text.UrlOps.normalizeUrl(col("url")).as("n"))
      .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == cases.map(_._2), got.zip(cases).filter { case (g, (_, e)) => g != e }.toString)
  }

  test("gopherRulesDf: junk trips the rules, clean prose passes, signals are exact") {
    val clean = (1 to 60).map(w => if (w % 7 == 0) "the" else s"word$w").mkString(" ")
    val docs = Seq(
      (1L, clean),                                   // long, stopwords, alpha → keep
      (2L, "short text the and"),                    // too few words
      (3L, ("# ## ### " * 30) + clean)               // symbol ratio blown
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRulesDf(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._7 == 1, s"clean doc dropped: ${out(1L)}")
    assert(out(2L)._7 == 0 && out(2L)._2 == 4)
    assert(out(3L)._7 == 0 && out(3L)._5 > 1000, s"symbol ratio not tripped: ${out(3L)}")
    // n_words and stop_hits are exact counts
    assert(out(1L)._2 == 60 && out(1L)._6 == 8)
  }

  test("charLmScoreDf: OOD junk scores lower mean probability than in-distribution text") {
    // 40 docs of common-pattern English + 1 junk doc: the corpus-
    // trained trigram model assigns the junk doc rare transitions
    val docs = ((1 to 40).map(i => (i.toLong, s"the quick brown fox number $i runs over the lazy dog")) :+
      (99L, "zxq vjw qqk xxz jqz wvx kqj zzx")).toDF("doc_id", "text")
    val out = TextAnalysis.charLmScoreDf(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 41)
    def mean(id: Long): Double = { val (n, s) = out(id); s.toDouble / n }
    val commonMean = (1 to 40).map(i => mean(i.toLong)).sum / 40
    assert(mean(99L) < commonMean / 2,
      s"junk ${mean(99L)} not well below common $commonMean")
    // n_tri = normalized length − 2 (docs ≥ 3 chars)
    val norm = docs.select(col("doc_id"), TextAnalysis.normalize(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    out.foreach { case (id, (n, _)) => assert(n == norm(id).length - 2, s"doc $id") }
    // short/empty docs drop out (no trigram)
    val tiny = Seq((1L, "ab"), (2L, ""), (3L, "abcd")).toDF("doc_id", "text")
    val kept = TextAnalysis.charLmScoreDf(tiny, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("dsirWeightsDf: target-like docs weigh positive, off-target negative") {
    // 20 target docs of one character distribution + 20 off-target of a
    // disjoint one: a doc's grams are either boosted by the target
    // model (p_T > p_C, diluted corpus) or absent from it (p_T ≈ 1/v)
    val docs = ((1 to 20).map(i => (i.toLong, s"the quick brown fox number $i", true)) ++
      (21 to 40).map(i => (i.toLong, s"zxq vjw qqk xxz jqz numero $i", false)))
      .toDF("doc_id", "text", "is_en")
    val out = TextAnalysis.dsirWeightsDf(docs, "doc_id", "text", col("is_en"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._3, r._4)).toMap
    assert(out.size == 40)
    (1 to 20).foreach { i =>
      val (w, keep) = out(i.toLong)
      assert(w > 0 && keep == 1L, s"target doc $i weight $w")
    }
    (21 to 40).foreach { i =>
      val (w, keep) = out(i.toLong)
      assert(w < 0 && keep == 0L, s"off-target doc $i weight $w")
    }
    // keep_flag is exactly sign(dsir_fp6)
    out.values.foreach { case (w, keep) => assert(keep == (if (w > 0) 1L else 0L)) }
  }

  test("domainDivergenceDf: zero for a corpus-shaped source, large for a drifted one") {
    // sources a and b share the corpus distribution exactly (identical
    // text); source z is pure out-of-vocabulary drift
    val docs = Seq(
      ("a", "red green blue red green blue"),
      ("b", "red green blue red green blue"),
      ("z", "qqq www qqq www qqq www")
    ).toDF("source", "text")
    val out = TextAnalysis.domainDivergenceDf(docs, "source", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set("a", "b", "z"))
    // identical sources measure identically (pure function of counts)
    assert(out("a") == out("b"))
    // the drifted source dominates: its tokens are 1/3 of the corpus
    // mass but 100% of its own, and it misses 2/3 of corpus mass
    assert(out("z")._2 > out("a")._2 * 3,
      s"drifted ${out("z")._2} vs corpus-shaped ${out("a")._2}")
    // single-source corpus: p = q for every term and no absent mass →
    // χ² exactly 0
    val single = Seq(("only", "x y z x y")).toDF("source", "text")
    val zero = TextAnalysis.domainDivergenceDf(single, "source", "text")
      .as[(String, Long, Long)].collect().head
    assert(zero._3 == 0L, s"single-source χ² must be 0, got ${zero._3}")
    // partitioning cannot move exact integer sums
    val out7 = TextAnalysis.domainDivergenceDf(docs.repartition(7), "source", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out7 == out)
  }

  test("BPE: a production-scale 32k merges table scales the hash map, not the plan") {
    // SCALE.md's claim, spec-enforced: BpeEncodeExpr builds the
    // pair→rank map ONCE from the merges literal via addReferenceObj,
    // so the GENERATED CODE is O(1) in vocab size — a 32k-entry table
    // (production GPT-2-scale) must compile to the same whole-stage
    // codegen size as the 24-entry default, not 1000× it. If the
    // literal itself ever starts inlining per-entry code, this is the
    // spec that catches it.
    import org.apache.spark.sql.functions.col
    def maxCode(merges: Seq[String]): Int = {
      // parquet-backed, NOT a local relation — ConvertToLocalRelation
      // would constant-fold a literal one-row frame in the optimizer
      // and there'd be no codegen stage to measure
      val df = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
        .limit(50)
        .select(TextAnalysis.bpeTokens(col("text"), merges).as("bpe"))
      df.collect() // AQE codegens lazily — run first
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
      assert(subtrees.nonEmpty, "no WSCG subtree — BPE fell out of codegen")
      subtrees.foreach { case (_, _, stats) =>
        assert(stats.maxMethodCodeSize > 0, "WSCG failed to compile (interpreted fallback)")
        assert(stats.maxMethodCodeSize < 65536, s"method is ${stats.maxMethodCodeSize} bytes")
      }
      subtrees.map(_._3.maxMethodCodeSize).max
    }
    // 32,768 distinct well-formed "left right" entries; (i/200, i%200)
    // is bijective below 40,000 so no duplicate pairs
    val big = (0 until 32768).map(i => s"w${i / 200} v${i % 200}")
    val small = maxCode(TextAnalysis.BpeMerges)
    val huge = maxCode(TextAnalysis.BpeMerges ++ big)
    assert(huge <= small + 512,
      s"generated code grew with vocab size: $small bytes @ 24 merges vs $huge @ 32k")
    // and the extra never-firing merges change nothing semantically
    val text = "the then ing of and order entity"
    def enc2(merges: Seq[String]): Seq[String] =
      Seq(text).toDF("text")
        .select(TextAnalysis.bpeTokens(col("text"), merges).as("bpe"))
        .as[Seq[String]].head()
    assert(enc2(TextAnalysis.BpeMerges ++ big) == enc2(TextAnalysis.BpeMerges))
  }

  test("BPE encode: canonical greedy walk — rank order, multi-level merges, left-to-right") {
    def enc(text: String, merges: Seq[String]): Seq[String] =
      Seq(text).toDF("text")
        .select(TextAnalysis.bpeTokens(col("text"), merges).as("bpe"))
        .as[Seq[String]].head()
    // multi-level: rank-1 "th e" can only fire after rank-0 "t h"
    // creates the th token; in "then" the (th,e) rank-1 merge beats
    // (e,n) at rank 8, stranding the n
    assert(enc("the then", TextAnalysis.BpeMerges) == Seq("the", "the", "n"))
    // rank order decides when two pairs are present: in "ing", (i,n)
    // at rank 2 beats (n,g) — absent from the table — then (in,g)
    assert(enc("ing", TextAnalysis.BpeMerges) == Seq("ing"))
    // left-to-right non-overlapping: "aaa" under merge (a,a) gives
    // [aa, a] — the merged token does NOT re-pair in the same pass,
    // and (aa,a) is not in the table
    assert(enc("aaa", Seq("a a")) == Seq("aa", "a"))
    assert(enc("aaaa", Seq("a a")) == Seq("aa", "aa"))
    assert(enc("aaaa", Seq("a a", "aa aa")) == Seq("aaaa"))
    // a pair exhausted in one pass becomes applicable again when a
    // LATER merge creates its right element: (x, bc) before (b, c)
    // never fires on "xbc" until bc exists
    assert(enc("xbc", Seq("b c", "x bc")) == Seq("xbc"))
    // lower rank wins when both pairs are present simultaneously
    assert(enc("xbc", Seq("x b", "b c")) == Seq("xb", "c"))
    // pre-tokenizer boundaries: merges never cross words, digits and
    // punctuation stay single tokens
    assert(enc("to t o 1 23 a.t", TextAnalysis.BpeMerges) ==
      Seq("to", "t", "o", "1", "2", "3", "a", ".", "t"))
    // empty text → empty token sequence (not null)
    assert(enc("", TextAnalysis.BpeMerges) == Seq.empty)
    // the default-merges path used by the registered query: count and
    // join survive a multi-word document
    val got = Seq((1L, "the rat ate the cheese"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.bpeTokens(col("text")).as("bpe"))
      .select(col("doc_id"), size(col("bpe")).as("n"), array_join(col("bpe"), " ").as("s"))
      .as[(Long, Int, String)].head()
    // the: t h→th, th e→the | rat: r a? no — (a,t) rank 9: r at |
    // ate: (a,t) → at e; (at,e) absent → at e | cheese:
    // c h→ch, e e? absent, e s→es, (ch,e) absent → ch e es e
    assert(got == ((1L, 10, "the r at at e the ch e es e")), got.toString)
  }

  test("bpeMergeFold matches a reference greedy left-to-right merge on random streams") {
    // property sweep: the tail-token fold must equal the canonical
    // index scan — incl. overlapping runs ("a b a b"), self-pairs
    // ((a,a) on "a a a"), and merged-token/plain-token collisions
    // ("aa" in the alphabet vs pair (a,a))
    val rnd = new scala.util.Random(41)
    val alphabet = Vector("a", "b", "c", "ab", "aa")
    val cases = (0 until 80).map { i =>
      val n = rnd.nextInt(14)
      val syms = Vector.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
      val a = alphabet(rnd.nextInt(3)); val b = alphabet(rnd.nextInt(3))
      (i.toLong, syms.mkString(" "), a, b, a + b)
    }
    def ref(sym: String, a: String, b: String, m: String): String = {
      val syms = if (sym.isEmpty) Array.empty[String] else sym.split(" ")
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += m; i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.mkString(" ")
    }
    val got = cases.toDF("id", "sym", "a", "b", "m")
      .select(col("id"),
        TextAnalysis.bpeMergeFold(col("sym"), col("a"), col("b"), col("m")).as("r"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (id, sym, a, b, m) =>
      assert(got(id) == ref(sym, a, b, m), s"case $id: sym='$sym' pair=($a,$b)")
    }
  }
}
