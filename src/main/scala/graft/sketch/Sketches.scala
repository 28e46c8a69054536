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

  /** HyperLogLog distinct-count sketch per group (Flajolet et al.
    * 2007), built DETERMINISTIC like [[kmvDistinct]]: value → 32-bit
    * md5 uniform, top `p` bits pick one of m = 2^p registers, the
    * register keeps the max of ρ = position of the leftmost 1-bit in
    * the remaining (32−p)-bit suffix. Estimate = α_m·m²/Σ 2^−M_b with
    * the standard linear-counting correction below 2.5m when empty
    * registers remain. Error ~ 1.04/√m; unlike KMV the state is m
    * FIXED-WIDTH registers (merge = elementwise max), which is why
    * HLL is the sketch that ships between executors / days / engines.
    *
    * Engine-exact construction: ρ is pure integer arithmetic
    * (`(32−p+1) − length(bin(w))` — both Spark and DuckDB render
    * binary without leading zeros), the register sum is carried as
    * Σ 2^(ρmax−M_b) in BIGINT (max m·2^ρmax ≪ 2^63), and the single
    * α_m·m²·2^ρmax numerator is folded to ONE double literal so the
    * final division is the only fp op — the estimate quantizes
    * identically on both engines.
    *
    * Shape for 100 TB: one partial-agg shuffle on (group, bucket) —
    * map-side combine collapses each task to ≤ m cells per group, so
    * the shuffle carries O(m·groups·tasks) regardless of row count;
    * the zero-register completion joins against a broadcast m-row
    * range. Output: group cols + (v_zero, reg_sum, hll_est_fp2).
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int = 8, salt: String = "hll"): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, p, salt), groupCols, p)

  /** The 32-bit md5 uniform feeding the HLL register split — the
    * same hash family as [[kmvDistinct]]/[[cmsBucket]]. */
  def hllUniform(value: Column, salt: String = "hll"): Column =
    conv(substring(md5(concat(lit(salt + ":"), value.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Register bucket + ρ derived from a MATERIALIZED uniform column
    * `u` ([[hllUniform]]) — the column pair every HLL build (batch or
    * streaming) splits its registers with. Sharing the exact
    * expressions is what makes streamed registers max-merge
    * bit-for-bit into the batch sketch. */
  def hllBucketRho(u: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"hllBucketRho: need 4 ≤ p ≤ 16, got $p")
    val width = 32 - p          // suffix bits feeding ρ
    val rhoMax = width + 1      // ρ when the suffix is all zeros
    val w = u.bitwiseAND(lit((1L << width) - 1))
    (shiftright(u, width),
      when(w === 0, lit(rhoMax)).otherwise(lit(rhoMax) - length(bin(w))))
  }

  /** SPARSE per-group registers (group cols + `bkt`, `mb`): only
    * buckets some value hit appear; absent buckets are M_b = 0 by
    * convention ([[hllEstimate]] completes them). This is the
    * mergeable/persistable form — union register sets from any
    * partition of the data (days, engines, a streaming window sweep)
    * and max-merge per (group, bkt) to get exactly the registers the
    * one-shot build produces. One partial-agg shuffle on (group,
    * bucket): ≤ m cells per group per task regardless of rows. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int = 8, salt: String = "hll"): DataFrame = {
    val gs = groupCols.map(col)
    val (bkt, rho) = hllBucketRho(col("_u"), p)
    df.select(gs :+ hllUniform(col(valueCol), salt).as("_u"): _*)
      .select(gs ++ Seq(bkt.as("bkt"), rho.as("_rho")): _*)
      .groupBy(gs :+ col("bkt"): _*)
      .agg(max(col("_rho")).as("mb"))
  }

  /** Estimate from SPARSE registers (the [[hllRegisters]] layout, or
    * any max-merged union of such sets — re-aggregating by max is
    * idempotent so pre-merged input needs no flag; explicit `mb = 0`
    * rows from a dense export are dropped as identical-to-absent).
    * Empty buckets never materialize: a present bucket always has
    * M_b ≥ 1, so v_zero = m − n_present and the register sum
    * completes arithmetically with v_zero·2^ρmax — no m-row grid, no
    * join, just the one (group, bkt) agg and a per-group fold. Then
    * the standard α_m·m²/Σ2^−M_b estimate with linear counting below
    * 2.5m. Output: group cols + (v_zero, reg_sum, hll_est_fp2). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"hllEstimate: need 4 ≤ p ≤ 16, got $p")
    val m = 1 << p
    val rhoMax = 32 - p + 1
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    // one double literal: α·m²·2^ρmax (the oracle embeds the same digits)
    val numerator = alpha * m * m * math.pow(2.0, rhoMax)
    val gs = groupCols.map(col)
    // re-max collapses any pre-merged duplicates per (group, bkt)
    val est = registers
      .filter(col("mb") > 0)
      .groupBy(gs :+ col("bkt"): _*)
      .agg(max(col("mb")).as("mb"))
      .groupBy(gs: _*)
      .agg(
        (lit(m.toLong) - count(lit(1))).as("v_zero"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $rhoMax - mb)")).as("_ps"))
      .withColumn("reg_sum", col("_ps") + col("v_zero") * lit(1L << rhoMax))
      .withColumn("_raw", lit(numerator) / col("reg_sum").cast("double"))
      .withColumn("_est",
        when(col("_raw") <= lit(2.5 * m) && col("v_zero") > 0,
          log(lit(m.toDouble) / col("v_zero").cast("double")) * m)
          .otherwise(col("_raw")))
    est.select(gs ++ Seq(col("v_zero"), col("reg_sum"),
      graft.text.TextAnalysis.fp(col("_est"), 2).as("hll_est_fp2")): _*)
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
