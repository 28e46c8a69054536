package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: build once, probe many — the ANN SERVING shape
  * at 100 TB, where [[Similarity.ivfSearch]] alone rebuilds centroid
  * assignment per query batch.
  *
  * Layout under `path`:
  *   - `vectors/`   — [[Similarity.ivfAssign]]'s (id, vec, nrm) rows,
  *     written `partitionBy("cell")`: one directory per inverted list.
  *   - `centroids/` — the k_cells-row (centroid_id, cvec, cnrm) table.
  *
  * Probing reads ONLY the probed cells' directories: the probe cell
  * set is collected (≤ k_cells values — bounded by INDEX CONFIG, not
  * data, the same driver-sized contract as the centroid table itself)
  * and pushed as a static `cell IN (...)` partition filter, so the
  * scan prunes at file-listing time — `PartitionFilters` in the plan,
  * no directory of an unprobed cell is even listed. Results are
  * bit-identical to [[Similarity.ivfSearch]] over the in-memory
  * assignment (spec-asserted): same centroids ⇒ same probe ranking ⇒
  * same candidates, and the cosine/tie arithmetic is shared.
  */
object IvfIndex {

  /** Build the index from a corpus and persist it. Returns the cell
    * count for logging/sizing. */
  def build(data: DataFrame, idCol: String, vecCol: String,
            kCells: Int, path: String): Long = {
    val cents = Similarity.ivfCentroids(data, idCol, vecCol, kCells)
    val assigned = Similarity.ivfAssign(data, idCol, vecCol, cents)
    write(assigned, cents, path)
    cents.count()
  }

  /** Persist a prebuilt assignment + centroid table (e.g. refined with
    * [[Similarity.kmeansCentroids]]). Crash safety: `vectors/` and
    * `centroids/` are two separate jobs, so the whole build is
    * bracketed with `_build_pending` — a build that dies between them
    * leaves a layout every serving entry point refuses loudly
    * ([[recoverIfPending]]) instead of probing half an index; the
    * heal is a rebuild (this method overwrites, so re-running it
    * clears the marker). A full rebuild also supersedes any crashed
    * append's pending state — both markers drop LAST. */
  def write(assigned: DataFrame, centroids: DataFrame, path: String): Unit = {
    val spark = assigned.sparkSession
    val fs = fsOf(spark, path)
    val bm = buildMarker(path)
    fs.mkdirs(bm.getParent)
    fs.create(bm, true).close()
    assigned.select(col("id"), col("vec"), col("nrm"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    centroids.select(col("centroid_id"), col("cvec"), col("cnrm"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    fs.delete(appendMarker(path), false)
    fs.delete(bm, false)
  }

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def buildMarker(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_build_pending")

  private def appendMarker(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_append_pending")

  /** True iff the layout at `path` is a SERVABLE index: both base
    * layers committed (`_SUCCESS`) and no `_build_pending` stranded by
    * a crashed build. With `pq = true` the PQ layers must be committed
    * too. Build-or-probe callers (the registered disk queries, a
    * serving job's cold start) gate on this instead of raw `_SUCCESS`
    * checks so a torn layout is REBUILT rather than refused. A
    * stranded `_append_pending` does NOT fail this check — probes
    * serve the committed prefix meanwhile ([[ensureServable]]) and
    * the next writer entry heals it ([[recoverIfPending]]); no
    * rebuild needed. */
  def isComplete(spark: SparkSession, path: String, pq: Boolean = false): Boolean = {
    val fs = fsOf(spark, path)
    def ok(sub: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$sub/_SUCCESS"))
    ok("vectors") && ok("centroids") &&
      (!pq || (ok("codes") && ok("codebook"))) &&
      !fs.exists(buildMarker(path))
  }

  /** Read-side gate, called by every serving entry point. Refuses a
    * layout torn by a crashed BUILD (`_build_pending` — not healable
    * in place, the build's source frame was the caller's; a rebuild
    * clears it). A stranded or in-flight `_append_pending` is
    * TOLERATED without healing: `vectors/` commits before `codes/`,
    * so readers always see a consistent committed prefix — exact
    * search sees every committed vector, and the PQ paths derive
    * their candidate set from `codes/`, so a vector whose codes have
    * not landed is simply not yet ingested from the probe's point of
    * view. Readers MUST NOT heal here: `_append_pending` is
    * legitimately present during any live [[append]], and a probe
    * that re-encoded "missing" codes concurrently with the appender
    * would land duplicate (id, sub) rows that double ADC distances in
    * [[Similarity.pqIvfSearch]]'s per-(query, id) sum. Healing is a
    * writer-side act ([[recoverIfPending]]). */
  private def ensureServable(spark: SparkSession, path: String): Unit = {
    if (fsOf(spark, path).exists(buildMarker(path)))
      throw new IllegalStateException(
        s"IVF index at $path was torn by a crashed build (_build_pending present) — rebuild required")
  }

  /** Crash recovery, called by every WRITER entry point ([[append]],
    * [[recenter]], [[recenterIfSkewed]] — and therefore the
    * [[IvfMaintain]] cron job, which bounds how long a stranded
    * marker can live). Mutating entry points are single-writer by
    * contract — one maintenance job owns the index at a time, the
    * same assumption the blue/green pointer flip already makes;
    * concurrent PROBES are always safe because serving paths never
    * write ([[ensureServable]]).
    *
    * A stranded `_build_pending` is not healable in place — refuse
    * loudly; a rebuild clears it.
    *
    * A stranded `_append_pending` IS healable: [[append]] commits
    * `vectors/` FIRST and `codes/` is a pure function of the stored
    * vectors × the FROZEN codebook, so recovery re-encodes exactly
    * the vectors whose codes are missing and appends them. Idempotent:
    * a crash during recovery strands the marker and the next entry
    * retries (the anti-join sees whatever already landed). Without
    * this, a crash between the two append jobs would leave vectors
    * that every PQ probe silently omits from its candidates — the
    * torn-export failure mode, applied to an index. */
  def recoverIfPending(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    ensureServable(spark, path)
    val m = appendMarker(path)
    if (!fs.exists(m)) return
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/codebook"))) {
      val missing = readVectors(spark, path)
        .join(spark.read.parquet(s"$path/codes").select(col("id")).distinct(),
          Seq("id"), "left_anti")
        .localCheckpoint() // pin: the codes write below must not re-read codes/
      if (!missing.isEmpty) {
        val cb = spark.read.parquet(s"$path/codebook")
        Similarity.pqEncode(missing, "id", "vec", cb, carry = Seq("cell"))
          .select(col("id"), col("sub"), col("code"), col("cell"))
          .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
      }
    }
    fs.delete(m, false)
  }

  def readCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")

  def readVectors(spark: SparkSession, path: String): DataFrame =
    // partition-column type inference may narrow cell to int — restore
    // the assignment's long so downstream joins need no implicit cast
    spark.read.parquet(s"$path/vectors")
      .withColumn("cell", col("cell").cast("long"))

  /** Probe search over the persisted index — [[Similarity.ivfSearch]]
    * semantics with the corpus scan pruned to the probed cells'
    * partitions. */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             idCol: String, vecCol: String, nprobe: Int, k: Int): DataFrame = {
    ensureServable(spark, path)
    val cents = readCentroids(spark, path)
    // filter BEFORE the long-cast so the IN lands directly on the raw
    // partition column (guaranteed listing-time pruning), cast after
    val pruned = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probedCells(cents, queries, idCol, vecCol, nprobe).map(Long.box): _*))
      .withColumn("cell", col("cell").cast("long"))
    Similarity.ivfSearch(pruned, queries, idCol, vecCol, cents, nprobe, k)
  }

  /** Probed cells across the query batch: ≤ k_cells distinct values
    * regardless of query count — safe to collect by construction. */
  private def probedCells(cents: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String, nprobe: Int): Array[Long] = {
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("_cos").desc, col("centroid_id"))
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        Similarity.norm(col(vecCol)).as("qnrm"))
      .crossJoin(broadcast(cents))
      .withColumn("_cos", Similarity.dot(col("qvec"), col("cvec")) / (col("qnrm") * col("cnrm")))
      .withColumn("_rk", row_number().over(wq))
      .filter(col("_rk") <= nprobe)
      .select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0))
  }

  /** Incremental maintenance: assign NEW vectors against the index's
    * EXISTING centroids and append them to the partitioned layout —
    * no rebuild, no touch of resident cells' files (parquet append
    * adds files per affected partition directory). The centroid set
    * is frozen by design: cells only grow, probes stay correct, and
    * the classic drift remedy (rebuild when cell-size skew crosses a
    * threshold) is a scheduled batch job, not an online mutation.
    * Returns the number of rows appended. */
  def append(newData: DataFrame, idCol: String, vecCol: String, path: String): Long = {
    val spark = newData.sparkSession
    recoverIfPending(spark, path) // heal any crashed predecessor first
    val cents = readCentroids(spark, path)
    // anti-join away ids already resident: retrying a crashed or
    // overlapping batch is IDEMPOTENT rather than double-ingested —
    // and the localCheckpoint pins the batch so the vectors write
    // below cannot re-read `vectors/` mid-append
    val assigned = Similarity.ivfAssign(newData, idCol, vecCol, cents)
      .join(readVectors(spark, path).select(col("id")), Seq("id"), "left_anti")
      .localCheckpoint()
    val n = assigned.count()
    if (n == 0) return 0L
    // the update is two jobs (vectors, then codes), so it brackets
    // itself with `_append_pending`: vectors commit FIRST, codes are
    // re-derivable from them ([[recoverIfPending]]), the marker drops
    // LAST. Resolve the filesystem FROM the index path (not the
    // default FS) so an index on a non-default scheme (s3a:// with an
    // HDFS default, say) doesn't throw 'Wrong FS' here.
    val fs = fsOf(spark, path)
    val m = appendMarker(path)
    fs.create(m, true).close()
    assigned.select(col("id"), col("vec"), col("nrm"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
    // a PQ layer must not go stale: encode the new vectors with the
    // index's FROZEN codebook (same contract as the frozen centroids)
    // and append their codes to the probed layout
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/codebook"))) {
      val cb = spark.read.parquet(s"$path/codebook")
      // encode the ASSIGNED frame: codes leave the encode cell-keyed —
      // no corpus-wide id join-back
      Similarity.pqEncode(assigned, "id", "vec", cb, carry = Seq("cell"))
        .select(col("id"), col("sub"), col("code"), col("cell"))
        .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
    }
    fs.delete(m, false)
    n
  }

  /** Per-cell row counts — the drift signal for scheduled
    * re-centering: [[append]] freezes centroids, so a shifting input
    * distribution shows up as cell-size skew. */
  def cellStats(spark: SparkSession, path: String): DataFrame = {
    ensureServable(spark, path)
    readVectors(spark, path).groupBy("cell").agg(count(lit(1)).as("n"))
  }

  /** max/avg cell size of the persisted index (1.0 = perfectly
    * balanced). Schedule [[recenter]] when this crosses the
    * deployment's threshold. */
  def skewRatio(spark: SparkSession, path: String): Double = {
    val r = cellStats(spark, path).agg(max("n").cast("double").as("mx"), avg("n").as("av")).head()
    r.getDouble(0) / r.getDouble(1)
  }

  /** Scheduled re-centering: re-derive Lloyd-refined centroids from
    * the CURRENT resident vectors and rebuild into `destPath` —
    * blue/green by design (the source index keeps serving; the caller
    * flips its pointer when the build lands), which also sidesteps
    * overwrite-while-reading hazards a same-path rebuild would hit.
    * Returns the new cell count. */
  def recenter(spark: SparkSession, srcPath: String, destPath: String,
               kCells: Int, iters: Int = 3): Long = {
    recoverIfPending(spark, srcPath)
    val vecs = readVectors(spark, srcPath).select(col("id"), col("vec"))
    val cents = Similarity.kmeansCentroids(vecs, "id", "vec", kCells, iters)
    val assigned = Similarity.ivfAssign(vecs, "id", "vec", cents)
    write(assigned, cents, destPath)
    cents.count()
  }

  /** Read the blue/green pointer: a tiny text file naming the ACTIVE
    * index root. Serving jobs resolve it per batch; the maintenance
    * job flips it after a rebuild lands ([[flipPointer]]). */
  def readPointer(spark: SparkSession, pointerPath: String): String = {
    val p = new org.apache.hadoop.fs.Path(pointerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Atomically point `pointerPath` at `indexPath`: write a temp file,
    * then FileContext.rename with OVERWRITE — readers see the old or
    * the new path, never a torn write. The filesystem is resolved
    * from the pointer's own path (not the default FS). */
  def flipPointer(spark: SparkSession, pointerPath: String, indexPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(pointerPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(pointerPath + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(indexPath.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The scheduled drift job [[append]]'s frozen-centroid contract
    * calls for: when the served index's [[skewRatio]] crosses
    * `threshold`, re-center into `destPath` ([[recenter]] — blue/green,
    * the old index keeps serving throughout) and flip the pointer.
    * Returns the measured skew and whether a flip happened — a no-op
    * run (skew under threshold) costs one per-cell count aggregate. */
  def recenterIfSkewed(spark: SparkSession, pointerPath: String, destPath: String,
                       kCells: Int, threshold: Double, iters: Int = 3): (Double, Boolean) = {
    val src = readPointer(spark, pointerPath)
    recoverIfPending(spark, src) // the maintenance job is the designated healer
    val skew = skewRatio(spark, src)
    if (skew <= threshold) (skew, false)
    else {
      recenter(spark, src, destPath, kCells, iters)
      flipPointer(spark, pointerPath, destPath)
      (skew, true)
    }
  }

  /** Extend a built index with PQ: the codebook (m×k rows) plus every
    * vector's codes partitioned by IVF cell — IVF-PQ at rest.
    * `codes/` rows are (id, sub, code, cell); a probe then reads
    * nprobe cell directories of 4-byte-scale codes instead of raw
    * vectors — the full Jégou-style serving layout. */
  def buildPq(data: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int, kCodes: Int, path: String,
              trained: Boolean = false, iters: Int = 3): Unit = {
    // trained = the per-subspace k-means refinement (better recall,
    // not oracle-replicable); the codebook persists either way, so
    // probes decode with whichever variant built the index
    val spark = data.sparkSession
    // same discipline as [[write]]: codes/ and codebook/ are two jobs,
    // so the layer build brackets itself with `_build_pending` — a
    // crash between them must not serve (a codebook-less codes/ read
    // fails loudly anyway, but the marker also covers a torn
    // overwrite of codes/ itself)
    val fs = fsOf(spark, path)
    val bm = buildMarker(path)
    fs.create(bm, true).close()
    val cb =
      if (trained) Similarity.pqCodebookTrained(data, idCol, vecCol, dim, m, kCodes, iters)
      else Similarity.pqCodebook(data, idCol, vecCol, dim, m, kCodes)
    val enc = Similarity.pqEncode(data, idCol, vecCol, cb)
    val cellOf = readVectors(spark, path).select(col("id"), col("cell"))
    enc.select(col("id"), col("sub"), col("code")).join(cellOf, "id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    cb.write.mode("overwrite").parquet(s"$path/codebook")
    fs.delete(bm, false)
  }

  /** IVF-PQ probe search over the persisted codes —
    * [[Similarity.pqIvfSearch]] semantics, with BOTH the cell
    * assignment and the ADC candidate codes read partition-pruned to
    * the probed cells. Asymmetric distances come from the per-query
    * LUT against `codebook/`; corpus floats are never read. */
  def searchPq(spark: SparkSession, path: String, queries: DataFrame,
               idCol: String, vecCol: String, nprobe: Int, k: Int): DataFrame = {
    ensureServable(spark, path)
    val cents = readCentroids(spark, path)
    val cb = spark.read.parquet(s"$path/codebook")
    val cells = probedCells(cents, queries, idCol, vecCol, nprobe).map(Long.box)
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(cells: _*))
      .withColumn("cell", col("cell").cast("long"))
    val assigned = codes.select(col("id"), col("cell")).distinct()
    // codes keep their cell: the in-memory probe is the same direct
    // cell equi-join as the at-rest partition pruning (`assigned` is
    // passed for the API but unused on this path)
    Similarity.pqIvfSearch(codes.select(col("id"), col("sub"), col("code"), col("cell")), cb,
      assigned, cents, queries, idCol, vecCol, nprobe, k)
  }

  /** Two-stage retrieve→rerank over the PERSISTED index —
    * [[Similarity.pqIvfRerank]] semantics at rest: the ADC retrieval
    * reads nprobe cell directories of codes ([[searchPq]]'s pruned
    * path, kCand candidates per query), and the exact-cosine rescore
    * reads true vectors from the SAME probed cells' `vectors/`
    * partitions — candidates live in probed cells by construction, so
    * the rescore scan partition-prunes identically and corpus floats
    * outside the probed cells are never read. The true-distance work
    * is ≤ queries·kCand rows regardless of corpus size. */
  def searchRerank(spark: SparkSession, path: String, queries: DataFrame,
                   idCol: String, vecCol: String,
                   nprobe: Int, kCand: Int, k: Int): DataFrame = {
    require(kCand >= k, s"searchRerank: kCand = $kCand must be >= k = $k")
    ensureServable(spark, path)
    val cents = readCentroids(spark, path)
    val cb = spark.read.parquet(s"$path/codebook")
    val cells = probedCells(cents, queries, idCol, vecCol, nprobe).map(Long.box)
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(cells: _*))
      .withColumn("cell", col("cell").cast("long"))
    val assigned = codes.select(col("id"), col("cell")).distinct()
    val approx = Similarity.pqIvfSearch(
      codes.select(col("id"), col("sub"), col("code"), col("cell")), cb,
      assigned, cents, queries, idCol, vecCol, nprobe, kCand)
    val dv = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(cells: _*))
      .select(col("id"), col("vec").as("_dv"))
    Similarity.rerankExact(approx, dv,
      queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")), k)
  }
}

/** Scheduled-maintenance entry point: run from cron/orchestration as
  * `IvfMaintain <pointerFile> <destPath> <kCells> <skewThreshold>`.
  * Measures the served index's cell-size skew and, past the
  * threshold, rebuilds into `destPath` and flips the pointer
  * ([[IvfIndex.recenterIfSkewed]]). Prints one JSON status line. */
object IvfMaintain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: IvfMaintain <pointerFile> <destPath> <kCells> <skewThreshold> [iters]")
    val Array(pointer, dest, kCells, threshold) = args.take(4)
    val iters = if (args.length > 4) args(4).toInt else 3
    // own the session lifecycle only when this main CREATED it — a
    // caller-provided active session (the e2e spec, or an
    // orchestration job embedding the maintenance step) survives
    val preExisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = preExisting.getOrElse(SparkSession.builder()
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate())
    val (skew, flipped) =
      IvfIndex.recenterIfSkewed(spark, pointer, dest, kCells.toInt, threshold.toDouble, iters)
    println(s"""{"skew":$skew,"flipped":$flipped,"active":"${IvfIndex.readPointer(spark, pointer)}"}""")
    if (preExisting.isEmpty) spark.stop()
  }
}
