package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Persisted MinHash-LSH band index — build once over a reference
  * corpus, probe every incoming crawl batch for NEAR-duplicates, the
  * incremental-ingestion twin of [[Dedup.dedupAgainst]] (which is
  * exact-hash only). The expensive stage — shingle→md5→minhash over
  * the reference — runs ONCE at build; a probe pays signatures for
  * the incoming batch only plus one (band, key) equi-join against the
  * stored banded rows.
  *
  * Layout under `path`:
  *   - `banded/` — the CAP-SURVIVING banded rows of the reference
  *     ([[Dedup.lshSurvivingBanded]]: cold buckets plain, hot buckets
  *     re-keyed on extended signature slots in the shifted band
  *     namespace — exactly [[Dedup.lshCandidatePairs]]' semantics, so
  *     probing the reference against its own index reproduces the
  *     self-join's candidate pairs, spec-asserted).
  *   - `sigs/`   — (doc, sig) reference signatures, for the
  *     agreement estimator on probe hits.
  *   - `config/` — one row (shingleSize, numPerm, rowsPerBand) so
  *     probes band identically to the build; callers cannot drift.
  *
  * Scale: the probe join is hash-partitioned on (band, key) — never
  * all-pairs; the incoming side is a batch (small relative to the
  * corpus), so AQE typically broadcasts it. `append` is not offered:
  * banded rows' cap survival depends on bucket counts, so growing the
  * reference is a rebuild (cheap relative to a crawl cycle) — unlike
  * [[graft.similarity.IvfIndex.append]], where the frozen-centroid
  * contract makes increments sound.
  */
object LshIndex {

  def build(reference: DataFrame, idCol: String, textCol: String, path: String,
            shingleSize: Int = 3, numPerm: Int = 8, rowsPerBand: Int = 2,
            maxBucket: Int = 0): Unit = {
    val spark = reference.sparkSession
    Dedup.lshSurvivingBanded(reference, idCol, textCol, shingleSize, numPerm,
        rowsPerBand, maxBucket, withSigs = false, resplit = true)
      .write.mode("overwrite").parquet(s"$path/banded")
    Dedup.sigTable(reference, idCol, textCol, shingleSize, numPerm)
      .write.mode("overwrite").parquet(s"$path/sigs")
    import spark.implicits._
    Seq((shingleSize, numPerm, rowsPerBand))
      .toDF("shingleSize", "numPerm", "rowsPerBand")
      .write.mode("overwrite").parquet(s"$path/config")
  }

  private def config(spark: SparkSession, path: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$path/config").head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  /** Candidate pairs (doc_inc, doc_ref, est_jaccard_fp4) between an
    * incoming batch and the indexed reference: incoming docs band with
    * the SAME config and probe BOTH namespaces — their plain (band,
    * key) and their extended key in the shifted band — so re-split
    * reference buckets are reachable; agreement is the classic
    * signature-slot estimator over the stored sigs. Self-matches
    * (same id) are excluded so a corpus can probe its own index. */
  def candidates(spark: SparkSession, path: String, incoming: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val (shingleSize, numPerm, rowsPerBand) = config(spark, path)
    val numBands = numPerm / rowsPerBand
    val incSigs = Dedup.sigTable(incoming, idCol, textCol, shingleSize, numPerm)
    val incBanded0 = Dedup.bandedRows(incSigs, numPerm, rowsPerBand,
      withSigs = true, resplit = true)
    val probe = incBanded0.select(col("doc"), col("sig"), col("band"), col("key"))
      .unionByName(incBanded0.select(col("doc"), col("sig"),
        (col("band") + numBands).as("band"), col("key_ext").as("key")))
    val stored = spark.read.parquet(s"$path/banded")
    val refSigs = spark.read.parquet(s"$path/sigs")
      .select(col("doc").as("doc_ref"), col("sig").as("sig_ref"))
    val est = TextAnalysis.fp(
      size(filter(zip_with(col("sig"), col("sig_ref"), (x, y) => x === y), b => b))
        .cast("double") / lit(numPerm.toDouble), 4)
    probe.as("i")
      .join(stored.as("r"),
        col("i.band") === col("r.band") && col("i.key") === col("r.key") &&
          col("i.doc") =!= col("r.doc"))
      .select(col("i.doc").as("doc_inc"), col("r.doc").as("doc_ref"), col("i.sig").as("sig"))
      .distinct()
      .join(refSigs, "doc_ref")
      .select(col("doc_inc"), col("doc_ref"), est.as("est_jaccard_fp4"))
  }

  /** Incoming rows with NO indexed near-duplicate at or above
    * `minEstFp4` signature agreement — the near-dup incremental
    * dedup gate (compose with [[Dedup.dedupAgainst]] for the exact
    * tier). */
  def filterNew(spark: SparkSession, path: String, incoming: DataFrame,
                idCol: String, textCol: String, minEstFp4: Long): DataFrame = {
    val dups = candidates(spark, path, incoming, idCol, textCol)
      .filter(col("est_jaccard_fp4") >= minEstFp4)
      .select(col("doc_inc").as(idCol)).distinct()
    incoming.join(dups, Seq(idCol), "left_anti")
  }
}
