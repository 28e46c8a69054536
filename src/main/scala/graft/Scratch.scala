package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for mm_audio_seg variants (deleted before commit). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.multimodal.Multimodal

    val dir = "/root/testdata/sf0.1"
    def payloads = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = ((id % 10 + 4) * 256 + id % 100).toInt
        val samples = Array.tabulate(n) { i =>
          val v = (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt
          if (((i >> 8) + id) % 3 == 0) v & 63 else v
        }
        val data = samples.flatMap { v =>
          val u = v & 0xffff
          Array((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
        }
        (id, Multimodal.synthWavHeader(1, 16000, 16, n * 2) ++ data)
      })
      .toDF("doc_id", "payload")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    // v0: payload synthesis alone
    time("synth-only")(payloads.select(col("doc_id"), length(col("payload")).as("len")))

    // v1: decode alone (projection-bound), single sum_sq walk
    time("decode+sumsq")(payloads
      .select(col("doc_id"), Multimodal.wavPcm16(col("payload")).as("pcm"))
      .select(col("doc_id"), aggregate(col("pcm"), lit(0L), (a, v) => a + v.cast("long") * v.cast("long")).as("ss")))

    // v2: current shape — HOF-let inside pcmFrameEnergies over composite decode
    time("cur-hoflet")(payloads
      .select(col("doc_id"), Multimodal.pcmFrameEnergies(Multimodal.wavPcm16(col("payload")), 256).as("en"))
      .select(col("doc_id"), size(col("en")).as("n")))

    // v3: projection-bound pcm, then frame energies on the attribute
    time("proj-bound")(payloads
      .select(col("doc_id"), Multimodal.wavPcm16(col("payload")).as("pcm"))
      .select(col("doc_id"), Multimodal.pcmFrameEnergies(col("pcm"), 256).as("en"))
      .select(col("doc_id"), size(col("en")).as("n")))

    // v4: projection-bound pcm, element_at-indexed inner fold (no slice copy)
    def framesNoSlice(p: org.apache.spark.sql.Column, frameLen: Int) =
      transform(sequence(lit(0), (size(p) / frameLen).cast("int") - 1),
        f => aggregate(sequence(f * frameLen + 1, f * frameLen + frameLen), lit(0L),
          (a, i) => {
            val v = element_at(p, i)
            a + v.cast("long") * v.cast("long")
          }))
    time("noslice")(payloads
      .select(col("doc_id"), Multimodal.wavPcm16(col("payload")).as("pcm"))
      .select(col("doc_id"), framesNoSlice(col("pcm"), 256).as("en"))
      .select(col("doc_id"), size(col("en")).as("n")))

    spark.stop()
  }
}
