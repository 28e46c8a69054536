package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: points `p` against intervals `[lo, hi]`,
  * p ∈ [lo, hi] — the 1-D analog of the spatial grid join (reference
  * shape: PostGIS `&&` bbox operators; SQL shape: a `BETWEEN` θ-join
  * that Spark would otherwise plan as BroadcastNestedLoopJoin).
  *
  * Both sides bucket by `floor(x / bucketWidth)`: a point lands in
  * exactly ONE bucket; an interval replicates over the buckets its
  * span covers (⌈len/W⌉+1 rows). The join is then a plain equi-join
  * on the bucket id — hash-shuffled, AQE/skew-safe, no cross product
  * — followed by the exact containment filter. Every qualifying
  * (point, interval) pair meets in exactly one bucket (the point's),
  * so there is NO dedup shuffle after the join.
  *
  * Pick `bucketWidth` ≈ the typical interval length: replication is
  * `len/W`, while candidate precision is `W/len` — the same lever as
  * the spatial grid cell. Unbounded intervals must be clamped by the
  * caller (a 100 TB scan must not replicate one interval to every
  * bucket in the domain).
  */
object RangeJoin {
  def intervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // the staging columns must not shadow real input columns —
    // withColumn would silently REPLACE them and corrupt the join
    // (_b on either side; _lo_b/_hi_b are only ever added to intervals)
    val reserved = Set("_b", "_lo_b", "_hi_b")
    val clash = (points.columns.filter(_ == "_b") ++
      intervals.columns.filter(reserved)).distinct
    require(clash.isEmpty,
      s"RangeJoin reserves the internal column name(s) ${clash.mkString(", ")}; rename in the input")
    val w = lit(bucketWidth)
    val p = points.withColumn("_b", floor(col(pointCol) / w).cast("long"))
    // inverted intervals (lo > hi) must fail loudly: sequence() would
    // otherwise emit a DESCENDING bucket walk whose rows the
    // containment filter then silently discards
    val iv = intervals
      .withColumn("_lo_b", floor(col(loCol) / w).cast("long"))
      .withColumn("_hi_b", floor(col(hiCol) / w).cast("long"))
      .withColumn("_b",
        explode(when(col("_lo_b") <= col("_hi_b"),
          sequence(col("_lo_b"), col("_hi_b")))
          .otherwise(raise_error(concat(
            lit(s"RangeJoin: inverted interval ($loCol > $hiCol): "),
            col(loCol).cast("string"), lit(" > "), col(hiCol).cast("string"))))))
      .drop("_lo_b", "_hi_b")
    p.join(iv, "_b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_b")
  }
}
