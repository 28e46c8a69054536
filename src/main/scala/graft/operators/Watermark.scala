package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark lateness accounting — the BATCH twin of Structured
  * Streaming's `withWatermark` drop rule, evaluated exactly so an
  * event-time pipeline can be audited before it ships: replaying the
  * log in arrival order, which events would a watermark of `delayMs`
  * have dropped? (Streaming itself can only report what it DID drop;
  * capacity-planning the delay needs the counterfactual.)
  *
  * Semantics (Spark's own, per the Structured Streaming guide): the
  * watermark after arrival i is max(event time over arrivals ≤ i) −
  * delay; an arriving event is LATE when its event time is below the
  * watermark established by STRICTLY EARLIER arrivals.
  *
  * Scale shape: the running max over the global arrival order is NOT
  * a single-task window — the [[graft.sample.Sampling.budgetSelect]]
  * prefix-scan idiom: range-repartition on the arrival column, collect
  * the per-partition max table (one 8-byte row per shuffle partition —
  * driver-sized at any sane parallelism), broadcast each partition's
  * EXCLUSIVE prefix max back as a literal when-chain, and run the
  * within-partition running max over single-partition slices only.
  * The range frame is pinned with localCheckpoint so both passes see
  * the same partition assignment.
  *
  * Output: the input rows plus `hwm` (the pre-arrival high-water mark,
  * null for the globally first arrival) and `is_late`.
  *
  * Determinism contract: the arrival order must be TOTAL. If
  * `arrivalCol` alone can tie, pass `tieCols` — they extend both the
  * range partitioning and the window order, so same-arrival peers get
  * a deterministic "strictly earlier" relation instead of a
  * partition-placement-dependent one (a tie split across range
  * partitions would otherwise see its peer through the exclusive
  * prefix max but not through the row frame). Rows with null
  * `timeCol` never advance the watermark (max ignores nulls, and an
  * all-null partition contributes no prefix).
  */
object Watermark {
  def lateness(df: DataFrame, arrivalCol: String, timeCol: String,
               delayMs: Long, tieCols: Seq[String] = Nil): DataFrame = {
    require(delayMs >= 0, "delayMs must be non-negative")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val orderCols = col(arrivalCol) +: tieCols.map(col)
    val ranged = df
      .repartitionByRange(p, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val partMax = ranged.groupBy("_pid")
      .agg(max(col(timeCol)).cast("long").as("_m"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    // exclusive prefix max of earlier partitions (None before the
    // first and while every earlier partition was all-null)
    val prefixes = partMax.map(_._2)
      .scanLeft(Option.empty[Long])((a, b) =>
        (a.toSeq ++ b.toSeq).reduceOption((x, y) => math.max(x, y))).init
    val prefixFor = partMax.map(_._1).zip(prefixes).foldLeft(lit(null).cast("long")) {
      case (acc, (pid, pre)) =>
        when(col("_pid") === pid, pre.map(lit(_)).getOrElse(lit(null)).cast("long"))
          .otherwise(acc)
    }
    val w = Window.partitionBy("_pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("hwm", greatest(max(col(timeCol)).over(w), prefixFor))
      .withColumn("is_late", coalesce(col("hwm") - lit(delayMs) > col(timeCol), lit(false)))
      .drop("_pid")
  }
}
