package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timed twins of the two sharded-export roundtrip bench rows.
  *
  * `src_wet_roundtrip` and `src_jsonl_roundtrip` time write + read +
  * verify as ONE number in the bench of record, which makes a
  * regression in any single phase (say, a manifest-verify cost on the
  * read side) unattributable without a profile session. Bench runs
  * these twins once after the timed sweep and records the per-phase
  * seconds in `target/bench_detail.json` under `export_detail`.
  *
  * The dataflows are kept IDENTICAL to the registered queries
  * ([[Pipeline]] `src_wet_roundtrip` / `src_jsonl_roundtrip`) — same
  * frames, same rangeBytes, same hash projection — only split at the
  * write/read seam and pointed at their own scratch dirs so a detail
  * run never races the timed rows' layouts.
  */
object ExportDetail {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** (write seconds, read+verify seconds) for the WET shard loop. */
  def wet(s: SparkSession, dir: String): Map[String, Double] = {
    val tmp = QueryUtil.scratchDir("wet_detail")
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(concat(lit("doc://"), col("doc_id")).as("url"),
        lit("conversion").as("warc_type"),
        lit("2024-01-01T00:00:00Z").as("date"), col("text"))
    val w = timed(graft.web.WarcWet.writeSharded(docs, tmp))
    val r = timed(noop(graft.web.WarcWet.read(s, tmp, rangeBytes = 4096L)
      .select(substring(col("url"), 7, 30).cast("long").as("doc_id"),
        col("length").as("n_bytes"), md5(col("text")).as("h"))))
    Map("write" -> w, "read_verify" -> r)
  }

  /** (write seconds, read+verify seconds) for the JSONL gzip loop. */
  def jsonl(s: SparkSession, dir: String): Map[String, Double] = {
    val tmp = QueryUtil.scratchDir("jsonl_detail")
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val w = timed(
      docs.write.mode("overwrite").option("compression", "gzip").json(tmp))
    val r = timed(noop(
      s.read.schema("doc_id LONG, lang STRING, source STRING, text STRING").json(tmp)
        .select(col("doc_id"), col("lang"), col("source"),
          length(col("text")).cast("long").as("n_chars_rt"),
          md5(col("text")).as("h"))))
    Map("write" -> w, "read_verify" -> r)
  }
}
