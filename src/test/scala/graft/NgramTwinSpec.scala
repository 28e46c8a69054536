package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Bit-equality of the native n-gram / minhash expressions against
  * their interpreted HOF twins, over every input shape the operators
  * see: empty, shorter-than-n, exact-n, long, multibyte, whitespace
  * runs, and null.
  */
class NgramTwinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val texts = Seq(
    "",
    "a",
    "ab",
    "abc",
    "the quick brown fox jumps over the lazy dog",
    "  leading   runs\tand\ttabs  ",
    "héllo wörld ünïcode grams über äll",
    "one",
    "one two",
    "one two three",
    "ONE TWO THREE four FIVE six seven eight nine ten eleven twelve",
    "repeat repeat repeat repeat repeat")

  private def df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("id", "text")

  test("tokens native == HOF twin (incl. multibyte, whitespace runs, null)") {
    val withNull = df.union(Seq((99L, null.asInstanceOf[String])).toDF("id", "text"))
    val rows = withNull.select(col("id"),
        TextAnalysis.tokens(col("text")).as("nat"),
        TextAnalysis.tokensHof(col("text")).as("hof"))
      .as[(Long, Option[Seq[String]], Option[Seq[String]])].collect()
    rows.foreach { case (id, nat, hof) => assert(nat == hof, s"text $id: $nat vs $hof") }
    assert(rows.find(_._1 == 99L).get._2.isEmpty, "null text -> null tokens")
  }

  test("charTrigrams native == HOF twin (incl. multibyte + short texts)") {
    val rows = df.select(col("id"),
        TextAnalysis.charTrigrams(col("text")).as("nat"),
        TextAnalysis.charTrigramsHof(col("text")).as("hof"))
      .as[(Long, Option[Seq[String]], Option[Seq[String]])].collect()
    rows.foreach { case (id, nat, hof) => assert(nat == hof, s"text $id") }
    assert(rows.exists(_._2.exists(_.isEmpty)), "battery must include a short text")
    assert(rows.exists(_._2.exists(_.size > 10)), "battery must include a long text")
  }

  test("shingles native == HOF twin for n = 2, 3, 5") {
    Seq(2, 3, 5).foreach { n =>
      val rows = df.select(col("id"),
          Dedup.shingles(col("text"), n).as("nat"),
          Dedup.shinglesHof(col("text"), n).as("hof"))
        .as[(Long, Option[Seq[String]], Option[Seq[String]])].collect()
      rows.foreach { case (id, nat, hof) => assert(nat == hof, s"n=$n text $id") }
    }
  }

  test("word n-grams partial mode == the segmentDedup HOF shape") {
    // the exact HOF expression segmentDedup used before nativizing
    def hofSegs(toksCol: org.apache.spark.sql.Column, k: Int) =
      graft.ColumnOps.let(toksCol) { toks =>
        transform(sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(k)),
          s => concat_ws(" ", slice(toks, s + 1, lit(k))))
      }
    Seq(3, 8).foreach { k =>
      val rows = df.select(col("id"),
          call_function("graft_word_ngrams",
            TextAnalysis.tokens(col("text")), lit(k), lit(k), lit(1)).as("nat"),
          hofSegs(TextAnalysis.tokens(col("text")), k).as("hof"))
        .as[(Long, Option[Seq[String]], Option[Seq[String]])].collect()
      rows.foreach { case (id, nat, hof) => assert(nat == hof, s"k=$k text $id") }
      // the empty-token-array edge must yield one "" window, not none
      assert(rows.find(_._1 == 0L).get._2.contains(Seq("")), "empty text edge")
    }
  }

  test("minhash native == HOF twin on real shingle arrays; empty array -> all-null signature") {
    val rows = df.select(col("id"),
        Dedup.minhash(Dedup.shingles(col("text"), 3), 8).as("nat"),
        Dedup.minhashHof(Dedup.shinglesHof(col("text"), 3), 8).as("hof"))
      .as[(Long, Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])].collect()
    rows.foreach { case (id, nat, hof) => assert(nat == hof, s"text $id") }
    // empty shingle array: both emit an all-null signature of length 8
    val empt = Seq(Tuple1(Seq.empty[String])).toDF("sh")
      .select(Dedup.minhash(col("sh"), 8).as("nat"), Dedup.minhashHof(col("sh"), 8).as("hof"))
      .as[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])].head()
    assert(empt._1 == empt._2 && empt._1.contains(Seq.fill(8)(None)), empt.toString)
  }

  test("segmentDedup keeps null-text docs (one empty segment, the pre-native HOF edge)") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", k = 2, threshold = 2)
      .select("doc").as[Long].collect().toSet
    assert(out == Set(1L, 2L), s"null-text doc must not vanish from the segment stream: $out")
  }

  test("null text: every native matches its HOF twin, incl. the all-null minhash signature") {
    val nd = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val r = nd.select(
        TextAnalysis.charTrigrams(col("text")).as("ct"),
        TextAnalysis.charTrigramsHof(col("text")).as("ct_hof"),
        Dedup.shingles(col("text"), 3).as("sh"),
        Dedup.shinglesHof(col("text"), 3).as("sh_hof"),
        Dedup.minhash(Dedup.shingles(col("text"), 3), 8).as("mh"),
        Dedup.minhashHof(Dedup.shinglesHof(col("text"), 3), 8).as("mh_hof"))
      .as[(Option[Seq[String]], Option[Seq[String]], Option[Seq[String]], Option[Seq[String]],
           Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])].head()
    assert(r._1.isEmpty && r._1 == r._2, "charTrigrams null parity")
    assert(r._3.isEmpty && r._3 == r._4, "shingles null parity")
    // the HOF let-binding evaluates its body on a null-bound lambda
    // var, so minhashHof(null) is an ALL-NULL signature, not null —
    // and that IS observable downstream: band keys concat_ws null
    // slots to "", so null-text docs still bucket together, and the
    // estimator's zip_with sees the array. The native wrapper
    // replicates it exactly.
    assert(r._5.contains(Seq.fill(8)(None)), "native minhash(null) is an all-null signature")
    assert(r._5 == r._6, "minhash null parity")
  }

  test("winnow native == HOF twin (incl. short, repeated, multibyte, null tokens)") {
    import graft.text.TextAnalysis
    val withNull = df.union(Seq((99L, null.asInstanceOf[String])).toDF("id", "text"))
    val rows = withNull.select(col("id"),
        TextAnalysis.winnow(TextAnalysis.tokens(col("text")), 3, 4).as("nat"),
        TextAnalysis.winnowHof(TextAnalysis.tokens(col("text")), 3, 4).as("hof"))
      .as[(Long, Option[Seq[(Int, Long)]], Option[Seq[(Int, Long)]])].collect()
    rows.foreach { case (id, nat, hof) => assert(nat == hof, s"text $id: $nat vs $hof") }
    // battery must include short docs (empty fingerprints) and long
    // docs (at least 2 fingerprints — the window actually slides)
    assert(rows.exists(_._2.exists(_.isEmpty)), "short doc -> no fingerprints")
    assert(rows.exists(_._2.exists(_.size >= 2)), "long doc -> multiple fingerprints")
    assert(rows.find(_._1 == 99L).get._2.isEmpty, "null text -> null")
    // a null token element must hash like concat_ws (skipped, no
    // separator), native == HOF
    val nt = Seq((1L, Seq("a", null, "b", "c", "d"))).toDF("id", "toks")
      .select(graft.text.TextAnalysis.winnow(col("toks"), 3, 2).as("nat"),
        graft.text.TextAnalysis.winnowHof(col("toks"), 3, 2).as("hof"))
      .as[(Seq[(Int, Long)], Seq[(Int, Long)])].head()
    assert(nt._1 == nt._2, s"null-token gram parity: ${nt._1} vs ${nt._2}")
  }

  test("winnow guarantees: density <= w and shared-substring detection") {
    import graft.text.TextAnalysis
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens = n+w-1
    val d = Seq(
      (1L, s"one two three four five $shared six seven eight nine ten"),
      (2L, s"$shared completely different tail content here okay")).toDF("id", "text")
    val fps = d.select(col("id"),
        explode(TextAnalysis.winnow(TextAnalysis.tokens(col("text")), 3, 4)).as("e"))
      .select(col("id"), col("e.pos").as("pos"), col("e.fp").as("fp"))
      .as[(Long, Int, Long)].collect()
    val byDoc = fps.groupBy(_._1)
    // winnowing guarantee: any shared run of >= n+w-1 tokens shares a fingerprint
    val inter = byDoc(1L).map(_._3).toSet intersect byDoc(2L).map(_._3).toSet
    assert(inter.nonEmpty, "6-token shared substring must share a fingerprint")
    // density: consecutive selected positions are at most w apart
    byDoc.values.foreach { sel =>
      val ps = sel.map(_._2).sorted
      ps.zip(ps.tail).foreach { case (a, b) => assert(b - a <= 4, s"gap $a -> $b") }
    }
  }

  test("shingleKey native == conv(substring(md5)) twin (incl. multibyte, empty, null)") {
    val withNull = df.union(Seq((99L, null.asInstanceOf[String])).toDF("id", "text"))
    val rows = withNull.select(col("id"),
        Dedup.shingleKey(col("text")).as("nat"),
        Dedup.shingleKeyHof(col("text")).as("hof"))
      .as[(Long, Option[Long], Option[Long])].collect()
    rows.foreach { case (id, nat, hof) => assert(nat == hof, s"text $id: $nat vs $hof") }
    assert(rows.find(_._1 == 99L).get._2.isEmpty, "null text -> null key")
    // 60-bit: non-negative, and at least one battery value needs the
    // full width (top nibble of the first digest byte non-zero)
    assert(rows.forall(_._2.forall(_ >= 0L)), "keys fit signed long")
    assert(rows.exists(_._2.exists(_ > (1L << 56))), "battery exercises high nibbles")
  }
}
