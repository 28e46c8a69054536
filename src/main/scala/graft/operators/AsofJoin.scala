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
  *
  * RESERVED NAMES: the implementation stages through internal columns
  * `_k _t _q _r _m _arr _f` and a payload struct field `_rt`. Inputs
  * whose columns (or payloadCols) collide are rejected with a clear
  * `require` error instead of silently mis-binding.
  */
object AsofJoin {
  private val Reserved = Set("_k", "_t", "_q", "_r", "_m", "_arr", "_f")

  private def checkNames(left: DataFrame, payloadCols: Seq[String]): Unit = {
    val clash = left.columns.filter(Reserved) ++ payloadCols.filter(c => Reserved(c) || c == "_rt")
    require(clash.isEmpty,
      s"AsofJoin reserves internal column names ${Reserved.mkString(", ")} and payload field _rt; " +
        s"rename colliding input columns: ${clash.mkString(", ")}")
  }

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
    checkNames(left, payloadCols)
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

  /** As-of by LOOKUP: the right side is pre-grouped per key into a
    * time-sorted payload array, the left side equi-joins on the key
    * and probes the array with a per-row HOF filter + last-element
    * pick. Same semantics and tie-breaks as [[asofBackward]]
    * (equivalence is spec-tested), different cost shape:
    *
    *   - sort-merge ([[asofBackward]]): both sides shuffle once —
    *     right when the right side is corpus-sized.
    *   - lookup (this): the right side must fit per-key in memory
    *     (dimension/reference tables — rates, versions, configs);
    *     the left side is NOT shuffled at all when the grouped right
    *     side broadcasts.
    *
    * Because the probe is stateless per row, this shape is
    * STREAM-SAFE: a readStream left against a static right is a
    * plain stream-static equi-join + projection — no watermark, no
    * state store (spec-driven on a MemoryStream).
    */
  def asofLookup(
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
    checkNames(left, payloadCols)
    val rGrouped = right.groupBy(col(rightKey).as("_k"))
      .agg(array_sort(collect_list(
        struct(col(rightTime).as("_rt") +: payloadCols.map(col): _*))).as("_arr"))
    val lt = col(leftTime)
    // ANSI mode: element_at(-1) on an EMPTY array throws — guard on
    // size (null _arr from the left join falls through to null too)
    val probed = left.join(rGrouped, col(leftKey) === col("_k"), "left")
      .withColumn("_f", filter(col("_arr"), e =>
        if (strict) e.getField("_rt") < lt else e.getField("_rt") <= lt))
      .withColumn("_m", when(size(col("_f")) > 0, element_at(col("_f"), -1)))
    val out = left.columns.map(col) :+
      col("_m._rt").as(prefix + "time") :++
      payloadCols.map(c => col(s"_m.$c").as(prefix + c))
    probed.select(out: _*)
  }
}
