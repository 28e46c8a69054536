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

  /** Count-min-sketch bucket for hash row `j`: first-8-md5-hex of
    * "cms<j>:<key>" as a uint32, mod `w` — the same md5-uniform
    * family as [[kmvDistinct]], one independent row per salt. */
  def cmsBucket(key: Column, j: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$j:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  /** Count-min sketch (Cormode–Muthukrishnan) frequency estimation
    * over a key column: `d` independent md5-derived hash rows of `w`
    * counters each; a key's estimate is the MIN of its d counters, an
    * upper bound on the true count that overshoots only on bucket
    * collisions (error ≤ e·N/w with prob 1−e^−d). Deterministic by
    * construction — retries, reruns, and a SQL oracle rebuild the
    * identical sketch.
    *
    * Shape for 100 TB: the d-row explode multiplies rows BEFORE the
    * partial agg, but map-side combine collapses each task's output to
    * ≤ d·w cells, so the sketch build shuffles O(d·w·tasks) tiny rows
    * regardless of input size — the whole sketch is d·w cells. The
    * estimate join probes those cells per distinct key (broadcast — the
    * sketch is driver-sized by construction). The exact count is
    * carried alongside for verification; in production the exact pass
    * is dropped and ONLY the sketch shuffles.
    *
    * Output: key col + (exact_n, cms_est), cms_est ≥ exact_n always.
    */
  def cmsFreq(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 64): DataFrame = {
    require(d >= 1 && w >= 2, s"cmsFreq: need d ≥ 1, w ≥ 2, got d=$d w=$w")
    val cells = df
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), cmsBucket(col(keyCol), j, w).as("b"))): _*)).as("e"))
      .groupBy(col("e.j").as("j"), col("e.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val keys = df.groupBy(keyCol).agg(count(lit(1)).as("exact_n"))
    keys
      .select(col(keyCol), col("exact_n"),
        explode(array((0 until d).map(j =>
          struct(lit(j).as("j"), cmsBucket(col(keyCol), j, w).as("b"))): _*)).as("e"))
      .join(broadcast(cells),
        col("e.j") === cells("j") && col("e.b") === cells("b"))
      .groupBy(col(keyCol), col("exact_n"))
      .agg(min(col("cnt")).as("cms_est"))
  }
}
