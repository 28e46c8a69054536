package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * [[asofBackwardEpoch]] is the skew-proof variant: identical
  * semantics, sort partitioned on (key, time-epoch) with carrier
  * seeding (the struct-max payload is mergeable, which is what makes
  * the split sound).
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

  /** FORWARD as-of: for every left row, the EARLIEST right row with
    * the same key whose time is ≥ the left row's time (> when
    * `strict`) — the "next event after" enrichment (next price tick,
    * next deploy, next maintenance window). Pure time-reversal of
    * [[asofBackward]]: both time columns are negated, the backward
    * sort-merge runs unchanged (same single shuffle + spillable-sort
    * cost shape), and the matched time is negated back. Requires a
    * NUMERIC time column (epoch ms — the library convention).
    *
    * Ties on (key, time) resolve to the struct-MAX payload at the
    * matched time, replicable in an oracle as min(time ≥ t) then
    * max(payload fields) at that time.
    */
  def asofForward(
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
    val lNeg = left.withColumn(leftTime, negate(col(leftTime)))
    val rNeg = right.withColumn(rightTime, negate(col(rightTime)))
    asofBackward(lNeg, leftKey, leftTime, rNeg, rightKey, rightTime,
      payloadCols, prefix, strict)
      .withColumn(leftTime, negate(col(leftTime)))
      .withColumn(prefix + "time", negate(col(prefix + "time")))
  }

  /** Skew-proof as-of: [[asofBackward]] semantics with the sort
    * partitioned on (key, time-epoch) instead of key alone — the
    * hot-key remedy the plain sort-merge cannot offer (one key's
    * entire history lands in ONE task there). Rows shuffle on
    * (key, floor(time / epochMs)); each group is seeded with a
    * CARRIER row holding the cumulative struct-max right payload of
    * all STRICTLY EARLIER epochs, so the within-group running
    * `last(payload)` resolves exactly as the global one:
    *
    *  - carrier seeds: right best per (key, epoch) (a map-side-
    *    combined agg), then a per-key running max over epoch-granular
    *    rows — a window whose groups are #occupied-epochs long,
    *    bounded by time-range/epochMs, never by row count.
    *  - carriers sort FIRST in their group (epoch-start time, tag
    *    below both sides), and being from earlier epochs they are
    *    valid matches in both strict and inclusive modes.
    *
    * Bit-identical to [[asofBackward]] (property-tested on random
    * series across epoch widths): the payload is struct-max-mergeable
    * by construction, which is exactly what makes the epoch split
    * sound. Pick `epochMs` so a hot key's per-epoch row count fits a
    * task (e.g. a day of ticks), trading two small extra shuffles for
    * unbounded key-skew tolerance.
    */
  def asofBackwardEpoch(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payloadCols: Seq[String],
      epochMs: Long,
      prefix: String = "asof_",
      strict: Boolean = false
  ): DataFrame = {
    require(epochMs > 0, "epochMs must be positive")
    checkNames(left, payloadCols)
    require(!left.columns.contains("_e") && !payloadCols.contains("_e"),
      "AsofJoin reserves the internal column name _e; rename it in the input")
    // exact floor division for any sign: (t - pmod(t, ep)) is divisible
    def epochOf(t: Column) = ((t - pmod(t, lit(epochMs))) / lit(epochMs)).cast("long")
    val rStruct = struct(col(rightTime).as("_rt") +: payloadCols.map(col): _*)
    val rType = right.select(rStruct.as("_r")).schema.head.dataType
    val rTagged = right.select(
      col(rightKey).as("_k"),
      col(rightTime).as("_t"),
      lit(if (strict) 2 else 0).as("_q"),
      rStruct.as("_r"))
      .withColumn("_e", epochOf(col("_t")))
    val lTagged = left.select(
      left.columns.map(col) :+
        col(leftKey).as("_k") :+ col(leftTime).as("_t") :+
        lit(1).as("_q") :+ lit(null).cast(rType).as("_r"): _*)
      .withColumn("_e", epochOf(col("_t")))
    // cumulative best payload over STRICTLY earlier epochs, evaluated
    // at every epoch holding a left row: markers (tag 0) sort before
    // the same epoch's right best (tag 1), so the running max at a
    // marker sees earlier epochs only
    // per-(key, epoch) best payload via a row_number window — max()
    // over the struct column would plan a SortAggregate; the window's
    // partitions are exactly the epoch-bounded slices the split
    // creates, so the sort is skew-capped by construction
    val wBest = Window.partitionBy("_k", "_e").orderBy(col("_r").desc)
    val rBest = rTagged
      .withColumn("_bn", row_number().over(wBest))
      .filter(col("_bn") === 1)
      .select(col("_k"), col("_e"), col("_r").as("_b"))
    val markers = lTagged.select(col("_k"), col("_e")).distinct()
      .select(col("_k"), col("_e"), lit(0).as("_tag"), lit(null).cast(rType).as("_b"))
    val wc = Window.partitionBy("_k").orderBy(col("_e"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seeds = markers.unionByName(rBest.withColumn("_tag", lit(1)))
      .withColumn("_seed", max(col("_b")).over(wc))
      .filter(col("_tag") === 0 && col("_seed").isNotNull)
      .select(col("_k"), col("_e"),
        (col("_e") * epochMs).as("_t"), lit(-1).as("_q"), col("_seed").as("_r"))
    val w = Window.partitionBy("_k", "_e")
      .orderBy(col("_t"), col("_q"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged
      .unionByName(rTagged, allowMissingColumns = true)
      .unionByName(seeds, allowMissingColumns = true)
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
