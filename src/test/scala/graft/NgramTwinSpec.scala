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
