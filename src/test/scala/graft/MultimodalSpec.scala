package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("magic detects png/jpeg/gif/unknown") {
    val rows = Seq(
      Multimodal.synthPngHeader(10, 20),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte),
      "GIF89a".getBytes("US-ASCII"),
      "nope".getBytes("US-ASCII")
    ).toDF("payload")
    val fmts = rows.select(Multimodal.magic(col("payload"))).as[String].collect().toSeq
    assert(fmts == Seq("png", "jpeg", "gif", "unknown"))
  }

  test("png dimensions parse back from the header") {
    val df = Seq((1L, Multimodal.synthPngHeader(640, 480))).toDF("id", "payload")
    val (w, h) = df.select(Multimodal.pngWidth(col("payload")), Multimodal.pngHeight(col("payload")))
      .as[(Long, Long)].head()
    assert(w == 640L && h == 480L)
    // non-png payload → null dims, not garbage
    val bad = Seq(("x", "notapng".getBytes("US-ASCII"))).toDF("id", "payload")
    assert(bad.select(Multimodal.pngWidth(col("payload"))).head().isNullAt(0))
  }

  test("decodeStub batches per partition and checks magic") {
    val df = Seq(
      (1L, Multimodal.synthPngHeader(5, 5)),
      (2L, "junk".getBytes("US-ASCII"))).toDF("id", "payload").repartition(2)
    val out = Multimodal.decodeStub(spark, df, "id", "payload")
      .select("id", "fmt_ok").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false))
  }

  test("frameSample keeps every stride-th frame") {
    val frames = Seq(Seq("a", "b", "c", "d", "e").map(_.getBytes("US-ASCII"))).toDF("frames")
    val kept = frames.select(Multimodal.frameSample(col("frames"), 2).as("s"))
      .selectExpr("transform(s, x -> x.i) AS idx").as[Seq[Int]].head()
    assert(kept == Seq(0, 2, 4))
  }
}
