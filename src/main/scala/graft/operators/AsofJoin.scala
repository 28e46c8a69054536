package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the LATEST right row with
  * the same key whose time is ≤ the left row's time (backward as-of —
  * the time-series/point-in-time enrichment the reference's PostGIS
  * stack would express with a LATERAL `ORDER BY ts DESC LIMIT 1`).
  *
  * Spark-first shape — a SORT-MERGE over a tagged union, not a range
  * join: both sides are tagged and unioned, shuffled ONCE on the key,
  * sorted within partitions by (time, side), and the match is a
  * running `last(payload, ignoreNulls)` window. Cost is one shuffle +
  * one external (spillable) sort — no interval replication, no
  * per-left-row probe, no range-condition BroadcastNestedLoopJoin,
  * which is what a naive `e.ts <= o.ts` θ-join plans. At 100 TB the
  * only hazard is a skewed key (one key's rows sort in one task) —
  * the standard salting lever applies on the RIGHT side only if the
  * payload is made mergeable; for key-skewed inputs prefer
  * sub-bucketing time into coarse epochs first.
  *
  * The matched payload travels as ONE struct column, so all output
  * fields come from the SAME right row even when some payload fields
  * are null (per-column `last(ignoreNulls)` would mix rows). Ties on
  * (key, time) resolve to the struct-max payload — deterministic, and
  * replicable in an oracle as max(time) then max(payload fields).
  *
  * `strict = true` excludes right rows AT the left row's time
  * (t_r < t_l): right rows then sort AFTER left rows on equal time,
  * so the running window cannot see them.
  *
  * Output: every left column plus `prefix + time` and
  * `prefix + <payload col>` (null when no right row precedes).
  */
object AsofJoin {
  def asofBackward(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payloadCols: Seq[String],
      prefix: String = "asof_",
      strict: Boolean = false
  ): DataFrame = {
    // payload struct leads with the right time so struct ordering is
    // (time, payload...) lexicographic — the tie-break is total
    val rStruct = struct(col(rightTime).as("_rt") +: payloadCols.map(col): _*)
    val rType = right.select(rStruct.as("_r")).schema.head.dataType
    val rTagged = right.select(
      col(rightKey).as("_k"),
      col(rightTime).as("_t"),
      lit(if (strict) 2 else 0).as("_q"),
      rStruct.as("_r"))
    val lTagged = left.select(
      left.columns.map(col) :+
        col(leftKey).as("_k") :+ col(leftTime).as("_t") :+
        lit(1).as("_q") :+ lit(null).cast(rType).as("_r"): _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_q"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_q") === 1)
    val out = left.columns.map(col) :+
      col("_m._rt").as(prefix + "time") :++
      payloadCols.map(c => col(s"_m.$c").as(prefix + c))
    matched.select(out: _*)
  }
}
