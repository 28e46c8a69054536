package graft.sample

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus sampling operators for training-data pipelines: domain
  * mixing (stratified rates per source) and sequence packing.
  *
  * Sampling is HASH-deterministic, not `rand()`-based: the keep
  * decision is a pure function of the row id, so reruns, retried
  * tasks, and speculative executions all agree on the sample —
  * `rand()` in a retried Spark task would resample and tear the
  * output. Determinism also makes the operator oracle-checkable.
  */
object Sampling {

  /** Uniform-in-[0,1) driven by the first 8 md5 hex chars of
    * `salt:id` — engine-portable (DuckDB recomputes it exactly). */
  def hashUniform(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** WEIGHT-proportional sample without replacement: sequential
    * Poisson / priority sampling (Ohlsson 1998; Duffield–Lund–Thorup
    * 2007). Each row gets priority q = w / u with u a per-id uniform;
    * the k largest priorities are the sample — inclusion probability
    * ≈ proportional to weight, without the per-row coin flips of
    * rate-based sampling ever dropping below k rows. The returned
    * frame carries `_prio` for the caller to surface or drop.
    *
    * Engine-exactness: u = (uint32 + 0.5) / 2³² — the +0.5 (exact in
    * double) keeps u strictly positive so q never divides by zero,
    * and the single division q = w/u is IEEE-correctly-rounded
    * identically on both engines, so the selected SET replicates
    * bit-for-bit (ties broken by id). Scale-invariant: multiplying
    * every weight by a constant rescales every priority, so the
    * selection is a function of relative weights only (spec).
    *
    * Shape: narrow priority computation + global top-k =
    * `TakeOrderedAndProject` — each task keeps its local k, the
    * driver merges k·tasks rows; no corpus sort, no shuffle. At
    * k large enough to strain the driver, swap the limit for the
    * salted two-stage window ([[graft.similarity.Similarity]]
    * topKPerQuery pattern).
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     salt: String = "wsmp"): DataFrame = {
    require(k >= 1, s"prioritySample: k must be ≥ 1, got $k")
    val u32 = conv(substring(md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("double")
    df.withColumn("_prio",
        col(weightCol).cast("double") / ((u32 + lit(0.5)) / lit(4294967296.0)))
      .orderBy(col("_prio").desc, col(idCol))
      .limit(k)
  }

  /** Stratified (per-stratum rate) deterministic sample. `rates` maps
    * stratum value → keep-rate; `defaultRate` covers unmapped strata.
    * Returns the kept rows plus the sampling weight (1/rate, fp4) for
    * unbiased downstream estimates.
    *
    * Narrow map + filter — no shuffle, scales linearly; the rates map
    * folds into the plan as a literal CASE (codegen'd, no UDF).
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "smp"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.withColumn("_rate", rate)
      .filter(hashUniform(col(idCol), salt) < col("_rate"))
      .withColumn("weight_fp4", graft.text.TextAnalysis.fp(lit(1.0) / col("_rate"), 4))
      .drop("_rate")
  }

  /** Temperature-scaled source sampling at α = 0.5 (the mBERT/XLM-R
    * multilingual mixing rule): stratum i is sampled toward mass
    * p_i ∝ √n_i, flattening the source distribution so small sources
    * are not drowned — keep-rate r_i = min(1, T·p_i / n_i) targets
    * ~`targetTotal` rows overall (capped strata yield fewer). One
    * tiny count aggregate (driver-sized: a row per stratum) resolves
    * the rates; sampling itself is the [[stratifiedSample]] narrow
    * hash-deterministic filter — zero corpus shuffle.
    *
    * Engine-exactness: √n_i is fp6-QUANTIZED per stratum before the
    * normalizer sums — the sum is then integer (commutative, no
    * float accumulation-order dependence) and every remaining double
    * op (one mul, one mul, one div — IEEE correctly rounded) runs in
    * the same order in the oracle, so the rates and the kept set
    * replicate bit-for-bit. α = 0.5 is fixed BECAUSE sqrt is
    * correctly rounded; a general-α variant would ride libm pow(),
    * which engines round differently — use it only outside
    * oracle-gated paths.
    *
    * Output: kept rows + `rate_fp6` (the stratum's keep-rate ×10⁶;
    * 1/rate is the unbiased reweight).
    *
    * Strata contract: the strata column is CAST to string before the
    * count collect (a non-string column would ClassCastException on
    * the driver read) and NULL strata rows are dropped from both the
    * rate table and the output — the same explicit-key contract
    * [[mixBudgetSelect]] gets via its budgets-key isin filter; a null
    * stratum has no sampling mass, so silently routing it to some
    * other stratum's rate would mis-weight both.
    */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
                        targetTotal: Long, salt: String = "tmp"): DataFrame = {
    require(targetTotal >= 0, "targetTotal must be non-negative")
    val strata = col(strataCol).cast("string")
    val counts = df.filter(strata.isNotNull)
      .groupBy(strata.as("_k")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "temperatureSample: empty input (or all-null strata)")
    val s6 = counts.map { case (k, n) =>
      (k, n, math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong)
    }
    val sTot = s6.map(_._3).sum // integer sum — order-free
    val rate6 = s6.map { case (k, n, s) =>
      val r = (targetTotal.toDouble * s.toDouble) / (sTot.toDouble * n.toDouble)
      k -> math.floor(math.min(1.0, r) * 1e6 + 0.5).toLong
    }
    val rateCol = rate6.tail.foldLeft(lit(rate6.head._2)) { case (acc, (k, v)) =>
      when(strata === k, lit(v)).otherwise(acc)
    }
    df.filter(strata.isNotNull)
      .withColumn("rate_fp6", rateCol)
      .filter(hashUniform(col(idCol), salt) < col("rate_fp6").cast("double") / lit(1e6))
  }

  /** Deterministic DISJOINT corpus split (train/val/test, eval
    * holdouts): `fractions` maps split name → mass (must sum to 1);
    * a row's split is where its md5-uniform falls against the
    * cumulative bounds — a pure function of (salt, id), so reruns,
    * task retries, and any repartitioning assign identically, and
    * every row lands in EXACTLY one split (the last split is the
    * otherwise-branch, so float dust cannot drop a row). Narrow map,
    * zero shuffle. Use dyadic fractions (0.75, 0.125, …) to keep the
    * boundary comparisons float-exact across engines.
    */
  def split(df: DataFrame, idCol: String,
            fractions: Seq[(String, Double)],
            salt: String = "spl"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must be positive and sum to 1")
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
    df.withColumn("_u", hashUniform(col(idCol), salt))
      .withColumn("split",
        fractions.init.zip(bounds.init).reverse
          .foldLeft(lit(fractions.last._1): Column) {
            case (acc, ((name, _), ub)) => when(col("_u") < ub, lit(name)).otherwise(acc)
          })
      .drop("_u")
  }

  /** Deterministic K-FOLD cross-validation assignment: fold =
    * floor(u·k) over the md5-uniform u — every row lands in exactly
    * one of k folds, rerun/retry/partitioning-stable (the property
    * that lets fold f's train set = "fold != f" be recomputed
    * anywhere without materializing k copies of the corpus). The
    * least() guard pins the (unreachable for k ≪ 2³²) u→1 edge to
    * fold k−1. Narrow map, zero shuffle. */
  def kfold(df: DataFrame, idCol: String, k: Int, salt: String = "kf"): DataFrame = {
    require(k > 1, "kfold needs k > 1")
    df.withColumn("fold",
      least(floor(hashUniform(col(idCol), salt) * k).cast("long"), lit(k - 1L)))
  }

  /** Budget-bounded corpus selection: walk the corpus in (scoreCol
    * DESC, idCol ASC) order and keep rows while the running sum of
    * `weightCol` stays ≤ `budget` — "take the best documents up to
    * N tokens", the curation step between scoring and training.
    *
    * Scale shape: a GLOBAL ordered cumulative sum without a global
    * single-task window — range-repartition on the order, per-
    * partition weight totals collected (one row per partition,
    * driver-sized by construction), exclusive prefix offsets
    * broadcast back as a literal CASE, then each partition windows
    * over its OWN rows only. The range frame is pinned with
    * localCheckpoint so the offsets and the final pass see the SAME
    * partition assignment (range boundaries are sampled per
    * execution; an unpinned recompute could shift rows between
    * passes). Result is boundary-independent — the total order is
    * strict (id tiebreak), so the selected set is deterministic.
    *
    * Output: the kept rows plus `cum_weight` (the running total
    * INCLUDING the row). */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                   weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // weights must be integral and the running total exact — a double
    // weight column would silently truncate per-partition sums
    val wType = df.schema(weightCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(wType.typeName),
      s"budgetSelect: weight column `$weightCol` must be an integral type, got $wType")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    // the per-partition offset table is collected: one row per shuffle
    // partition — driver-sized at any sane parallelism (a 1000-executor
    // job runs 10³-10⁴ partitions; the 8-byte rows are nothing). Warn
    // past 10⁵ partitions: the offset when-chain and the collect are
    // both linear in p, so a pathological partition count belongs in a
    // coarser repartitionByRange, not here.
    if (p > 100000)
      System.err.println(s"WARN budgetSelect: $p shuffle partitions — the per-partition " +
        "offset table is linear in partition count; consider a coarser range partitioning")
    val ranged = df
      .repartitionByRange(p, col(scoreCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val partSums = ranged.groupBy("_pid")
      .agg(coalesce(sum(col(weightCol)).cast("long"), lit(0L)).as("_w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partSums.scanLeft(0L)(_ + _._2).init
    val offsetFor = partSums.map(_._1).zip(offsets).foldLeft(lit(0L)) {
      case (acc, (pid, off)) => when(col("_pid") === pid, lit(off)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_pid")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    ranged
      .withColumn("cum_weight", sum(col(weightCol)).over(w) + offsetFor)
      .filter(col("cum_weight") <= budget)
      .drop("_pid")
  }

  /** Domain-MIXTURE selection: per-stratum budget-bounded pick — the
    * data-mixing step between scoring and training. Given target
    * weight budgets per stratum (mixture weight × total token budget,
    * resolved by the caller), keep each stratum's best rows
    * (`scoreCol` DESC, `idCol` ASC) until that stratum's budget is
    * exhausted. Strata without a budget entry are dropped.
    *
    * [[budgetSelect]]'s global-cumsum shape applied PER STRATUM in a
    * single pass: range-repartition on (stratum, order) so each
    * stratum's rows are contiguous across the partition sequence,
    * per-(partition, stratum) weight totals collected (≤ partitions ×
    * strata rows — driver-sized for any sane mixture), exclusive
    * prefix offsets within each stratum broadcast-joined back, then
    * windows run over single-partition slices only — never a
    * per-stratum single-task window, which at 100 TB would funnel a
    * dominant source through one reducer. The same partitions≲10⁵
    * note as [[budgetSelect]] applies.
    *
    * Output: kept rows + `cum_weight` (running stratum total
    * INCLUDING the row).
    */
  def mixBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                      weightCol: String, strataCol: String,
                      budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      "mixBudgetSelect: budgets must be non-empty and non-negative")
    val wType = df.schema(weightCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(wType.typeName),
      s"mixBudgetSelect: weight column `$weightCol` must be an integral type, got $wType")
    val spark = df.sparkSession
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    if (p > 100000)
      System.err.println(s"WARN mixBudgetSelect: $p shuffle partitions — the offset table " +
        "is linear in partition count; consider a coarser range partitioning")
    val known = df.filter(col(strataCol).isin(budgets.keys.toSeq: _*))
    val ranged = known
      .repartitionByRange(p, col(strataCol), col(scoreCol).desc, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val partSums = ranged.groupBy(col("_pid"), col(strataCol))
      .agg(coalesce(sum(col(weightCol)).cast("long"), lit(0L)).as("_w"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = partSums.groupBy(_._2).iterator.flatMap { case (s, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _).init)
        .map { case (pid, off) => (pid, s, off) }
    }.toSeq.toDF("_pid", strataCol, "_off")
    val budgetDf = budgets.toSeq.toDF(strataCol, "_budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid"), col(strataCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    ranged
      .join(broadcast(offsets), Seq("_pid", strataCol))
      .join(broadcast(budgetDf), Seq(strataCol))
      .withColumn("cum_weight", sum(col(weightCol)).over(w) + col("_off"))
      .filter(col("cum_weight") <= col("_budget"))
      .drop("_pid", "_off", "_budget")
  }

  /** Deterministic "reservoir": EXACTLY k rows per stratum, chosen by
    * ranking on the md5-uniform — unlike rate sampling the output
    * size per stratum is fixed, and unlike a true reservoir the
    * choice is a pure function of ids (reruns/retries agree, and the
    * sample is stable under re-partitioning). One shuffle on the
    * stratum key; the rank is a top-k window, so at 100 TB prefer
    * raising `numStrata` over raising k (the per-stratum sort is
    * bounded by stratum size).
    */
  def reservoirPerStratum(df: DataFrame, idCol: String, strataCol: String,
                          k: Int, salt: String = "rsv"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(hashUniform(col(idCol), salt), col(idCol))
    df.withColumn("rank_in_stratum", row_number().over(w).cast("long"))
      .filter(col("rank_in_stratum") <= k)
  }

  /** Deterministic global shuffle into `numShards` training shards —
    * the corpus-order randomization every epoch-0 training run needs.
    * Shard = md5-hash bucket of the id; position within the shard =
    * rank by the full md5 hex. A pure function of (salt, id): reruns,
    * task retries, and different input partitionings all produce the
    * SAME shard files, and changing `salt` is a fresh epoch
    * permutation. (`orderBy(rand())` — the naive spelling — is none
    * of those, and a retried task would silently tear it.)
    *
    * Scale shape: one hash shuffle on the shard id + an external
    * (spillable) sort per shard. Shards are uniform by construction
    * (md5 bucketing — no skew), so at 100 TB the lever is simply more
    * shards: size `numShards` so a shard ≈ one output file.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, numShards: Int,
                           salt: String = "shf"): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.withColumn("_h", md5(concat(lit(salt + ":"), col(idCol).cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("_h"), 1, 8), 16, 10).cast("long"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }

  /** Next-fit sequence packing: assign documents to training-context
    * bins of at most `budget` tokens (a document longer than `budget`
    * gets a bin of its own). Documents are routed to `numGroups`
    * independent packing groups by `id % numGroups` and packed in id
    * order within each group.
    *
    * Scale shape: ONE hash shuffle on the group key, an external
    * (spillable) sort within partitions, then a streaming
    * `mapPartitions` fold — per-task state is three longs, never a
    * buffered group, so group size is bounded by disk, not memory.
    * Choose `numGroups` ≈ corpus_tokens / (budget × bins_per_task) to
    * keep tasks even; packing quality is unaffected by the split
    * (bins never span groups by construction).
    *
    * Returns (doc_id, grp, bin, n_tokens) with bin 0-based per group.
    */
  def packNextFit(spark: SparkSession, df: DataFrame, idCol: String,
                  weightCol: String, budget: Long, numGroups: Int): DataFrame = {
    import spark.implicits._
    val routed = df
      .select(col(idCol).cast("long").as("doc_id"),
        pmod(col(idCol).cast("long"), lit(numGroups.toLong)).as("grp"),
        col(weightCol).cast("long").as("n_tokens"))
      .repartition(numGroups, col("grp"))
      .sortWithinPartitions("grp", "doc_id")
      .as[(Long, Long, Long)]
    routed.mapPartitions { it =>
      var curGrp = Long.MinValue
      var bin = -1L
      var fill = 0L
      it.map { case (doc, grp, w) =>
        if (grp != curGrp) { curGrp = grp; bin = 0L; fill = w }
        else if (fill + w <= budget) { fill += w }
        else { bin += 1L; fill = w }
        (doc, grp, bin, w)
      }
    }.toDF("doc_id", "grp", "bin", "n_tokens")
  }
}
