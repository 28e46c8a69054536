package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate aggregation sketches for 100 TB profiling, built
  * DETERMINISTIC: every sketch here is a pure function of the data
  * (md5-derived uniforms), so retried tasks, reruns, and a DuckDB
  * oracle all reproduce the sketch — and its estimate — bit-for-bit.
  * Spark's own `approx_count_distinct` (HLL++) trades that for a few
  * bytes less state; when cross-engine verifiability or retry
  * determinism matters, these are the drop-ins.
  */
object Sketches {

  /** K-minimum-values (bottom-k) distinct-count sketch per group:
    * hash every value to a uniform in [0,1) (the [[graft.sample.Sampling.hashUniform]]
    * md5 scheme), keep each group's k smallest distinct hashes;
    * distinct-count ≈ (k−1)/h_k with h_k the k-th smallest — the
    * classic KMV estimator (Bar-Yossef et al.), error ~ 1/√k. Groups
    * holding fewer than k distinct values report their EXACT count
    * (the sketch degenerates to the distinct set itself).
    *
    * Shape: one partial-agg dedup shuffle on (group, hash), then a
    * per-group bottom-k window — per-group sort is bounded by the
    * group's distinct count; for millions of distinct values per
    * group pre-prune with a `_u < k·c/n̂` filter or salt the window
    * ([[graft.similarity.Similarity.topKPerQuery]] pattern). The
    * sketch is mergeable by construction: union bottom-k sets and
    * re-bottom.
    *
    * Output: group cols + (n_kept, est_distinct_fp2).
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"kmvDistinct: k must be ≥ 2, got $k")
    val gs = groupCols.map(col)
    val hashed = df
      .select(gs :+ graft.sample.Sampling.hashUniform(col(valueCol), salt).as("_u"): _*)
      .distinct()
    val w = Window.partitionBy(gs: _*).orderBy(col("_u"))
    hashed
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("_u")).as("_hk"))
      .select(gs ++ Seq(col("n_kept"),
        graft.text.TextAnalysis.fp(
          when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(lit((k - 1).toDouble) / col("_hk")), 2).as("est_distinct_fp2")): _*)
  }
}
