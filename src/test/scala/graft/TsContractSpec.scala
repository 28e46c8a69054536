package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.QueryUtil

/** The events `ts` contract: the driver has materialized
  * events.parquet's ts as long-nanos (timestamp[ns] via nanosAsLong)
  * in some rounds and as a real TIMESTAMP(_NTZ) in others. tsMs()
  * must normalize every physical shape to the SAME bigint epoch-ms —
  * including floor semantics for pre-1970 values — so a driver-side
  * regeneration can never strand the event-query family again.
  */
class TsContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // epoch micros covering: mid-ms remainder, exact ms boundary, and a
  // pre-1970 value whose floor-ms differs from truncate-toward-zero.
  private val micros = Seq(1735689600123456L, 86400000000L, -1500L, 0L)
  private val wantMs = Seq(1735689600123L, 86400000L, -2L, 0L)

  private def run(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val out = df.select(QueryUtil.tsMs(df).as("ms"))
    assert(out.schema("ms").dataType == LongType, out.schema.treeString)
    out.collect().map(_.getLong(0)).toSeq
  }

  test("tsMs on TIMESTAMP (ltz) micros") {
    val df = spark.range(micros.size)
      .select(timestamp_micros(
        element_at(typedLit(micros), col("id").cast("int") + 1)).as("ts"))
    assert(run(df) == wantMs)
  }

  test("tsMs on TIMESTAMP_NTZ micros") {
    val df = spark.range(micros.size)
      .select(timestamp_micros(
        element_at(typedLit(micros), col("id").cast("int") + 1))
        .cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(run(df) == wantMs)
  }

  test("tsMs on LONG nanos (the nanosAsLong surface)") {
    val df = spark.range(micros.size)
      .select((element_at(typedLit(micros), col("id").cast("int") + 1) * 1000L).as("ts"))
    assert(df.schema("ts").dataType == LongType)
    assert(run(df) == wantMs)
  }

  test("tsMs matches the live events.parquet schema end-to-end") {
    val e = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val n = e.select(QueryUtil.tsMs(e).as("ms")).filter(col("ms") > 0).count()
    assert(n > 0)
  }
}
