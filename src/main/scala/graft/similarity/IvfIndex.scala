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
    * [[Similarity.kmeansCentroids]]). */
  def write(assigned: DataFrame, centroids: DataFrame, path: String): Unit = {
    assigned.select(col("id"), col("vec"), col("nrm"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    centroids.select(col("centroid_id"), col("cvec"), col("cnrm"))
      .write.mode("overwrite").parquet(s"$path/centroids")
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
    val cents = readCentroids(spark, path)
    val assigned = Similarity.ivfAssign(newData, idCol, vecCol, cents)
    assigned.select(col("id"), col("vec"), col("nrm"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
    // a PQ layer must not go stale: encode the new vectors with the
    // index's FROZEN codebook (same contract as the frozen centroids)
    // and append their codes to the probed layout
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/codebook"))) {
      val cb = spark.read.parquet(s"$path/codebook")
      Similarity.pqEncode(newData, idCol, vecCol, cb)
        .select(col("id"), col("sub"), col("code"))
        .join(assigned.select(col("id"), col("cell")), "id")
        .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
    }
    newData.count()
  }

  /** Per-cell row counts — the drift signal for scheduled
    * re-centering: [[append]] freezes centroids, so a shifting input
    * distribution shows up as cell-size skew. */
  def cellStats(spark: SparkSession, path: String): DataFrame =
    readVectors(spark, path).groupBy("cell").agg(count(lit(1)).as("n"))

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
    val vecs = readVectors(spark, srcPath).select(col("id"), col("vec"))
    val cents = Similarity.kmeansCentroids(vecs, "id", "vec", kCells, iters)
    val assigned = Similarity.ivfAssign(vecs, "id", "vec", cents)
    write(assigned, cents, destPath)
    cents.count()
  }

  /** Extend a built index with PQ: the codebook (m×k rows) plus every
    * vector's codes partitioned by IVF cell — IVF-PQ at rest.
    * `codes/` rows are (id, sub, code, cell); a probe then reads
    * nprobe cell directories of 4-byte-scale codes instead of raw
    * vectors — the full Jégou-style serving layout. */
  def buildPq(data: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int, kCodes: Int, path: String): Unit = {
    val cb = Similarity.pqCodebook(data, idCol, vecCol, dim, m, kCodes)
    val enc = Similarity.pqEncode(data, idCol, vecCol, cb)
    val cellOf = readVectors(data.sparkSession, path).select(col("id"), col("cell"))
    enc.select(col("id"), col("sub"), col("code")).join(cellOf, "id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    cb.write.mode("overwrite").parquet(s"$path/codebook")
  }

  /** IVF-PQ probe search over the persisted codes —
    * [[Similarity.pqIvfSearch]] semantics, with BOTH the cell
    * assignment and the ADC candidate codes read partition-pruned to
    * the probed cells. Asymmetric distances come from the per-query
    * LUT against `codebook/`; corpus floats are never read. */
  def searchPq(spark: SparkSession, path: String, queries: DataFrame,
               idCol: String, vecCol: String, nprobe: Int, k: Int): DataFrame = {
    val cents = readCentroids(spark, path)
    val cb = spark.read.parquet(s"$path/codebook")
    val cells = probedCells(cents, queries, idCol, vecCol, nprobe).map(Long.box)
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(cells: _*))
      .withColumn("cell", col("cell").cast("long"))
    val assigned = codes.select(col("id"), col("cell")).distinct()
    Similarity.pqIvfSearch(codes.select(col("id"), col("sub"), col("code")), cb,
      assigned, cents, queries, idCol, vecCol, nprobe, k)
  }
}
