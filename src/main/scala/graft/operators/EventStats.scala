package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream volume statistics — the telemetry/data-quality side
  * of a training-data pipeline (ingest monitoring: which source×day
  * volumes are anomalous before they poison a mixture).
  */
object EventStats {

  /** Per-key daily-volume outlier flags: day d of key g is an outlier
    * iff |n_d − μ_g| > k·σ_g over g's observed days. The rule is
    * evaluated EXACTLY — no float mean/stddev, whose accumulation
    * order diverges across engines and partitionings:
    *
    *   |n − S/N| > k·σ  ⟺  (n·N − S)² > k²·(N·Q − S²)
    *
    * with S = Σn, Q = Σn², N = #days — all integers. The squared
    * staging rides DECIMAL(38,0) (the χ² lesson from txt_domain_div:
    * day counts near 1e12 would overflow BIGINT squares at 100 TB
    * while d38 holds to ~1e19 per factor), so the flag is
    * bit-reproducible for any engine that does exact decimal
    * arithmetic — the DuckDB oracle replicates it in HUGEINT.
    *
    * Plan shape: the (key, day, n) pre-aggregation is consumed twice
    * (stats input + join left side), so it is localCheckpoint-PINNED
    * (it is key×day-sized) — without the pin both references would
    * recompute it, i.e. scan the raw event stream twice (the
    * dd_dup_ngrams doc lesson: never claim exchange reuse Spark does
    * not do). After the pin: one raw-stream pass into the pinned
    * table, one tiny stats agg over it (rows = #keys, always
    * broadcastable), one broadcast join back — no window.
    */
  private def d38(c: Column) = c.cast("decimal(38,0)")

  /** The per-key volume profile the rule scores against:
    * N = #observed days, S = Σn, Q = Σn² (d38-staged). Broadcastable
    * by construction (rows = #keys); also the "trained model" the
    * STREAMING twin ([[graft.streaming.EventStreams.anomalyScore]])
    * joins as a static frame. */
  def volumeStats(perDay: DataFrame, keyCol: String, nCol: String): DataFrame =
    perDay.groupBy(keyCol).agg(
      count(lit(1)).as("_nd"),
      sum(nCol).as("_tot"),
      sum(d38(col(nCol)) * d38(col(nCol))).as("_sumsq"))

  /** The exact outlier predicate — ONE shared expression for the
    * batch query and the streaming twin, so the two can never drift.
    * (The shared dev factor is referenced twice; ProjectExec codegen
    * CSEs it.) */
  def outlierFlag(n: Column, nd: Column, tot: Column, sumsq: Column, k: Int): Column = {
    val dev = d38(n) * d38(nd) - d38(tot)
    when(dev * dev > lit(k.toLong * k) * (d38(nd) * sumsq - d38(tot) * d38(tot)), 1L)
      .otherwise(0L)
  }

  def dailyVolumeOutliers(perDay: DataFrame, keyCol: String, dayCol: String,
                          nCol: String, k: Int = 2): DataFrame = {
    val pinned = perDay.localCheckpoint()
    pinned.join(broadcast(volumeStats(pinned, keyCol, nCol)), keyCol)
      .withColumn("outlier",
        outlierFlag(col(nCol), col("_nd"), col("_tot"), col("_sumsq"), k))
      .select(col(keyCol), col(dayCol), col(nCol), col("outlier"))
  }
}
