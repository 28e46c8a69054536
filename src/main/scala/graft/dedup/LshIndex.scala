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
  *   - `banded/` (or, after any FULL re-band, the highest-numbered
  *     committed `banded_g{N}/` generation — see [[swapBanded]]) —
  *     the CAP-SURVIVING banded rows of the reference
  *     ([[Dedup.survivingBandedFixedCap]]: cold buckets plain, hot
  *     buckets re-keyed on extended signature slots in the shifted
  *     band namespace — exactly [[Dedup.lshCandidatePairs]]'
  *     semantics, so probing the reference against its own index
  *     reproduces the self-join's candidate pairs, spec-asserted).
  *     Written `partitionBy("grp")` with grp = hash(plain band, key)
  *     mod `numGroups`, carried onto re-split rows: every row derived
  *     from a plain bucket lives in that bucket's group partition —
  *     the unit of incremental maintenance.
  *   - `sigs/`   — (doc, sig) reference signatures, for the
  *     agreement estimator on probe hits AND for [[append]]'s
  *     re-banding (sigs are the expensive stage; re-banding them is
  *     cheap).
  *   - `config/` — one row (shingleSize, numPerm, rowsPerBand,
  *     maxBucket, numGroups, nDocs) so probes band identically to the
  *     build and appends resolve the same cap rule; callers cannot
  *     drift.
  *
  * Scale: the probe join is hash-partitioned on (band, key) — never
  * all-pairs; the incoming side is a batch (small relative to the
  * corpus), so AQE typically broadcasts it. [[append]] recomputes and
  * dynamically overwrites ONLY the group partitions its new docs
  * touch (cap survival depends on per-bucket counts, and a new row
  * can flip its bucket hot — the whole bucket re-splits, so the
  * bucket's group is regenerated from stored + new sigs); when the
  * ADAPTIVE cap value itself moves (corpus growth crosses a √N
  * boundary), cap survival changes EVERYWHERE and the append degrades
  * to a full re-band — still from stored sigs, never re-hashing text.
  */
object LshIndex {

  private def capOf(maxBucket: Int, nDocs: Long): Long =
    if (maxBucket <= 0) math.max(64L, math.floor(math.sqrt(nDocs.toDouble)).toLong)
    else maxBucket.toLong

  def build(reference: DataFrame, idCol: String, textCol: String, path: String,
            shingleSize: Int = 3, numPerm: Int = 8, rowsPerBand: Int = 2,
            maxBucket: Int = 0, numGroups: Int = 256): Unit = {
    val spark = reference.sparkSession
    // torn-BUILD detection: a build overwrites banded/sigs/config in
    // sequence, and a kill between them leaves a READABLE but
    // inconsistent index (new banded against old sigs, say) that no
    // recovery can heal — the source text is not stored. Bracket the
    // whole build with its own marker: every public entry point gates
    // on it and refuses the torn layout loudly instead of serving it.
    val fs = marker(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bm = buildMarker(path)
    fs.mkdirs(bm.getParent)
    fs.create(bm, true).close()
    // a rebuild writes the plain `banded/` layout; stale generation
    // dirs from the previous index life would outrank it at
    // resolution ([[bandedDir]] prefers the highest committed
    // generation), so they go first — probes are locked out by the
    // build marker for the whole window
    listGens(fs, path, completeOnly = false)
      .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(genPath(path, n)), true))
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/banded_tmp"), true)
    val sigs = Dedup.sigTable(reference, idCol, textCol, shingleSize, numPerm)
      .localCheckpoint()
    val n = sigs.count()
    Dedup.survivingBandedFixedCap(sigs, numPerm, rowsPerBand, capOf(maxBucket, n),
        resplit = true, numGroups = numGroups)
      .write.mode("overwrite").partitionBy("grp").parquet(s"$path/banded")
    sigs.write.mode("overwrite").parquet(s"$path/sigs")
    writeConfig(spark, path, shingleSize, numPerm, rowsPerBand, maxBucket, numGroups, n)
    // a full rebuild supersedes any crashed append's pending state;
    // the build marker drops LAST — the index reads as complete only
    // after every layer is in place
    val m = marker(path)
    fs.delete(m, false)
    fs.delete(bm, false)
  }

  /** Config updates must be crash-atomic: [[recoverIfPending]] reads
    * config while the `_append_pending` marker is still up, so a plain
    * `mode("overwrite")` (delete-then-rewrite) crashed mid-write would
    * leave `config/` unreadable and recovery would throw instead of
    * heal. Write the new rows to `config_tmp/`, then swap via DELETE +
    * atomic directory RENAME — `config/` is therefore always either
    * the complete old directory or the complete new one, never partial
    * (a crash in the delete→rename window leaves `config/` absent and
    * `config_tmp/` complete, which writers promote on read and
    * readers fall back to without renaming — [[rawConfig]]). */
  private def writeConfig(spark: SparkSession, path: String, shingleSize: Int,
                          numPerm: Int, rowsPerBand: Int, maxBucket: Int,
                          numGroups: Int, nDocs: Long): Unit = {
    import spark.implicits._
    Seq((shingleSize, numPerm, rowsPerBand, maxBucket, numGroups, nDocs))
      .toDF("shingleSize", "numPerm", "rowsPerBand", "maxBucket", "numGroups", "nDocs")
      .write.mode("overwrite").parquet(s"$path/config_tmp")
    val fs = marker(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cfg = new org.apache.hadoop.fs.Path(s"$path/config")
    fs.delete(cfg, true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/config_tmp"), cfg)
  }

  private case class Config(shingleSize: Int, numPerm: Int, rowsPerBand: Int,
                            maxBucket: Int, numGroups: Int, nDocs: Long)

  /** Read the config row. `promote = true` (writer side) heals a
    * crash in [[writeConfig]]'s delete→rename window by renaming the
    * complete `config_tmp/` into place; readers pass `promote =
    * false` and just READ the tmp directory when `config/` is absent
    * — same bytes, no filesystem mutation from a serving path. */
  private def rawConfig(spark: SparkSession, path: String, promote: Boolean): Config = {
    val fs = marker(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cfg = new org.apache.hadoop.fs.Path(s"$path/config")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/config_tmp")
    val src =
      if (fs.exists(cfg)) s"$path/config"
      else if (promote && fs.exists(tmp)) { fs.rename(tmp, cfg); s"$path/config" }
      else s"$path/config_tmp"
    val r = spark.read.parquet(src)
      .select("shingleSize", "numPerm", "rowsPerBand", "maxBucket", "numGroups", "nDocs")
      .head()
    Config(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))
  }

  /** WRITER-side config resolution: heals any pending state first
    * ([[recoverIfPending]]). Mutating entry points are single-writer
    * by contract (one maintenance job owns the index at a time). */
  private def config(spark: SparkSession, path: String): Config = {
    recoverIfPending(spark, path)
    rawConfig(spark, path, promote = true)
  }

  /** READER-side config resolution: refuses a torn build, tolerates a
    * stranded or in-flight `_append_pending` WITHOUT healing — the
    * marker is legitimately present during any live [[append]], and a
    * probe that re-banded concurrently with the appender would race
    * its `banded/` update. Concurrency contract for probes racing a
    * live append: full re-bands (cap change, recovery) commit into a
    * fresh RETAINED generation ([[swapBanded]] + [[bandedDir]]
    * resolution), so a probe reads one complete layout — the one it
    * resolved survives on disk until a SECOND full re-band supersedes
    * it; the same-cap incremental path overwrites only the affected
    * `grp=` partitions, so a probe's listing may mix pre- and
    * post-append GROUPS (each internally consistent — a
    * near-committed state in which some candidates already reflect
    * the in-flight batch). A probe never serves torn part files, and
    * a stranded marker is healed by the next writer entry. */
  private def readerConfig(spark: SparkSession, path: String): Config = {
    val fs = marker(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(buildMarker(path)))
      throw new IllegalStateException(
        s"LSH index at $path was torn by a crashed build (_build_pending present) — rebuild required")
    rawConfig(spark, path, promote = false)
  }

  private def marker(path: String) = new org.apache.hadoop.fs.Path(s"$path/_append_pending")

  private def buildMarker(path: String) = new org.apache.hadoop.fs.Path(s"$path/_build_pending")

  private val GenRe = "banded_g([0-9]+)".r

  private def genPath(path: String, n: Long) = s"$path/banded_g$n"

  /** Generation numbers under `path`. A generation is COMMITTED once
    * it carries the `_COMMITTED` marker [[swapBanded]] drops after the
    * parquet job finishes — `completeOnly = true` filters to those;
    * `false` also returns the torn remains of crashed swaps. */
  private def listGens(fs: org.apache.hadoop.fs.FileSystem, path: String,
                       completeOnly: Boolean): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case GenRe(n) if !completeOnly ||
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_COMMITTED")) => Some(n.toLong)
        case _ => None
      }
    }
  }

  /** banded swap discipline for FULL re-bands (the cap-changing
    * append and crash recovery): write the new layout to a fresh
    * GENERATION directory `banded_g{N}/`, mark it committed, and only
    * then prune layouts at least one whole swap old — the previous
    * generation is RETAINED. A probe therefore never loses part files
    * mid-scan across a single re-band: the directory it resolved (the
    * then-current generation, or the legacy `banded/`) survives until
    * the NEXT full re-band supersedes it. Only a probe that stays
    * in-flight across TWO full re-bands can observe deleted files —
    * full re-bands are the rare cap-change/recovery path, so that
    * window is two maintenance cycles, not one directory delete.
    *
    * Crash-safe at every step: a crash before `_COMMITTED` leaves a
    * torn generation that resolution ignores and the next swap
    * deletes; a crash after commit but before prune leaves an extra
    * complete generation that resolution outranks and the next swap
    * prunes. */
  private def swapBanded(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val fs = marker(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val complete = listGens(fs, path, completeOnly = true)
    val cur = complete.sorted.lastOption
    // torn remains of crashed prior swaps (no _COMMITTED marker)
    (listGens(fs, path, completeOnly = false).toSet -- complete.toSet)
      .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(genPath(path, n)), true))
    val next = genPath(path, cur.getOrElse(0L) + 1)
    write(next)
    fs.create(new org.apache.hadoop.fs.Path(s"$next/_COMMITTED"), true).close()
    // prune: keep the new generation and the immediately previous
    // layout; everything older has already sat out one full swap
    cur.foreach { c =>
      complete.filter(_ < c)
        .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(genPath(path, n)), true))
      // the legacy plain `banded/` (+ a stranded pre-generation
      // `banded_tmp/`) is older than generation 1 — prune once a
      // generation has itself been superseded
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/banded"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/banded_tmp"), true)
    }
  }

  /** Banded-layout resolution, reader and writer side: the
    * highest-numbered COMMITTED generation wins; indexes that have
    * never full-re-banded serve the plain `banded/` a build writes;
    * `banded_tmp/` is the legacy fallback for an index whose last
    * writer was the old delete+rename code and crashed mid-swap. */
  private[graft] def bandedDir(spark: SparkSession, path: String): String = {
    val fs = marker(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val complete = listGens(fs, path, completeOnly = true)
    if (complete.nonEmpty) genPath(path, complete.max)
    else if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/banded"))) s"$path/banded"
    else s"$path/banded_tmp"
  }

  /** Crash recovery for [[append]]'s multi-step update. An append
    * brackets its writes with the `_append_pending` marker; if a crash
    * strands the marker, `banded/` and `config/` may be behind the
    * appended `sigs/` (or partially rewritten). `sigs/` is the
    * append's FIRST committed write and banded/config are pure
    * functions of it, so recovery re-bands the whole layout from the
    * stored sigs (no text is ever re-hashed), rewrites config with the
    * recount, and drops the marker — restoring the rebuild-equivalence
    * invariant exactly. Idempotent: a crash DURING recovery leaves the
    * marker in place and the next entry retries.
    *
    * Called from WRITER entry points only ([[append]], and via the
    * [[config]] gate). Probes must not heal: the marker is
    * legitimately up during a live append, and a probe re-banding
    * concurrently would race the appender's own `banded/` overwrite —
    * readers instead serve the committed snapshot ([[readerConfig]]).
    */
  private def recoverIfPending(spark: SparkSession, path: String): Unit = {
    val m = marker(path)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a stranded BUILD marker is not healable (the corpus text is not
    // stored) — refuse the torn layout instead of serving it
    if (fs.exists(buildMarker(path)))
      throw new IllegalStateException(
        s"LSH index at $path was torn by a crashed build (_build_pending present) — rebuild required")
    if (!fs.exists(m)) return
    // immutable banding params are safe to read from a stale config —
    // only nDocs moves across appends, and that is recounted here
    val c = rawConfig(spark, path, promote = true)
    val sigs = spark.read.parquet(s"$path/sigs")
    val n = sigs.count()
    swapBanded(spark, path) { dst =>
      Dedup.survivingBandedFixedCap(sigs, c.numPerm, c.rowsPerBand, capOf(c.maxBucket, n),
          resplit = true, numGroups = c.numGroups)
        .write.mode("overwrite").partitionBy("grp").parquet(dst)
    }
    writeConfig(spark, path, c.shingleSize, c.numPerm, c.rowsPerBand, c.maxBucket,
      c.numGroups, n)
    fs.delete(m, false)
  }

  /** Incremental ingestion: band `incoming` with the stored config and
    * fold it into the index. The new docs' signatures append to
    * `sigs/`; `banded/` is maintained by recomputing ONLY the group
    * partitions the new rows touch — from stored + new sigs, so rows
    * previously dropped or re-split inside an affected bucket are
    * re-derived correctly — and dynamically overwriting those
    * partitions (groups whose buckets all drop are deleted outright).
    * If corpus growth moves the ADAPTIVE cap value itself, cap
    * survival changes in every bucket and the whole banded layout is
    * re-banded from sigs (the documented rebuild-on-cap-change case —
    * no text is ever re-hashed). Returns the number of docs appended.
    *
    * Append semantics are REBUILD-EQUIVALENT by construction:
    * build(A) + append(B) produces the same banded row set as
    * build(A ∪ B) (spec-asserted), so probes cannot tell an
    * incrementally-grown index from a fresh one.
    *
    * Crash safety: the update is multi-step (sigs, banded partitions,
    * config), so it brackets itself with the `_append_pending` marker
    * and commits `sigs/` FIRST — a crash anywhere in the sequence is
    * healed by [[recoverIfPending]] on the next append or scheduled
    * maintenance run (re-band from sigs; probes meanwhile serve the
    * committed snapshot), and docs already present in `sigs/` are
    * anti-joined away, so retrying a crashed or overlapping batch is
    * idempotent rather than double-counted.
    */
  def append(incoming: DataFrame, idCol: String, textCol: String, path: String): Long = {
    val spark = incoming.sparkSession
    val c = config(spark, path) // heals any pending state first
    val storedDocs = spark.read.parquet(s"$path/sigs").select("doc")
    val newSigs = Dedup.sigTable(incoming, idCol, textCol, c.shingleSize, c.numPerm)
      .join(storedDocs, Seq("doc"), "left_anti")
      .localCheckpoint()
    val nNew = newSigs.count()
    if (nNew == 0) return 0L
    val nTotal = c.nDocs + nNew
    val oldCap = capOf(c.maxBucket, c.nDocs)
    val newCap = capOf(c.maxBucket, nTotal)
    val m = marker(path)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(m, true).close()
    newSigs.write.mode("append").parquet(s"$path/sigs")
    val allSigs = spark.read.parquet(s"$path/sigs")
    if (newCap != oldCap) {
      // cap-survival changed globally → full re-band from sigs,
      // swapped in rename-based so concurrent probes never scan a
      // half-deleted layout
      swapBanded(spark, path) { dst =>
        Dedup.survivingBandedFixedCap(allSigs, c.numPerm, c.rowsPerBand, newCap,
            resplit = true, numGroups = c.numGroups)
          .write.mode("overwrite").partitionBy("grp").parquet(dst)
      }
    } else {
      // groups touched by the new docs' plain-namespace rows — ≤
      // numGroups values by construction, safe to collect
      val newBanded = Dedup.bandedRows(newSigs, c.numPerm, c.rowsPerBand,
        withSigs = false, resplit = false)
      val affected = newBanded
        .select(pmod(hash(col("band"), col("key")), lit(c.numGroups)).as("grp"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val regenerated = Dedup.survivingBandedFixedCap(allSigs, c.numPerm, c.rowsPerBand,
          newCap, resplit = true, numGroups = c.numGroups, groupFilter = Some(affected))
        .localCheckpoint()
      // in-place partition maintenance targets the CURRENT layout —
      // the plain banded/ of a never-re-banded index, or the live
      // generation dir after any full swap
      val cur = bandedDir(spark, path)
      regenerated
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("grp").parquet(cur)
      // an affected group whose buckets ALL dropped writes no
      // partition — dynamic overwrite would leave its stale files
      val nonEmpty = regenerated.select("grp").distinct().collect().map(_.getInt(0)).toSet
      (affected.toSet -- nonEmpty).foreach { g =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$cur/grp=$g"), true)
      }
    }
    writeConfig(spark, path, c.shingleSize, c.numPerm, c.rowsPerBand, c.maxBucket,
      c.numGroups, nTotal)
    fs.delete(m, false) // commit point: the append is now fully visible
    nNew
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
    val c = readerConfig(spark, path)
    val numBands = c.numPerm / c.rowsPerBand
    val incSigs = Dedup.sigTable(incoming, idCol, textCol, c.shingleSize, c.numPerm)
    val incBanded0 = Dedup.bandedRows(incSigs, c.numPerm, c.rowsPerBand,
      withSigs = true, resplit = true)
    val probe = incBanded0.select(col("doc"), col("sig"), col("band"), col("key"))
      .unionByName(incBanded0.select(col("doc"), col("sig"),
        (col("band") + numBands).as("band"), col("key_ext").as("key")))
    val stored = spark.read.parquet(bandedDir(spark, path))
    val refSigs = spark.read.parquet(s"$path/sigs")
      .select(col("doc").as("doc_ref"), col("sig").as("sig_ref"))
    val est = TextAnalysis.fp(
      size(filter(zip_with(col("sig"), col("sig_ref"), (x, y) => x === y), b => b))
        .cast("double") / lit(c.numPerm.toDouble), 4)
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

  /** Continuous-crawl ingestion: every micro-batch of the STREAMING
    * `incoming` frame runs the full batch near-dup gate
    * ([[filterNew]]) against the index, appends survivors to
    * `outPath`, and — with `appendToIndex` on — folds the survivors
    * INTO the index ([[append]]), so a near-duplicate arriving in a
    * LATER batch is dropped against documents accepted in earlier
    * ones. The standard foreachBatch shape for per-batch logic a
    * streaming join cannot express (the gate needs banding + a
    * distinct + an anti-join per batch).
    *
    * Semantics notes: duplicates WITHIN one micro-batch are not
    * gated against each other (the index only learns a batch after
    * the batch is filtered) — run [[Dedup.lshCandidatePairs]] over
    * the accepted output if intra-batch dups matter; restarts replay
    * the current batch (foreachBatch is at-least-once), so `outPath`
    * can carry a replayed batch twice — the exact-dedup tier
    * downstream absorbs this, or use a transactional sink.
    */
  def ingest(spark: SparkSession, path: String, incoming: DataFrame,
             idCol: String, textCol: String, minEstFp4: Long,
             outPath: String, appendToIndex: Boolean = true,
             checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    require(incoming.isStreaming, "ingest expects a streaming DataFrame; use filterNew for batch")
    val writer = incoming.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // pin the filtered batch: it must be materialized against the
      // PRE-append index state, and append() below re-reads it
      val kept = filterNew(spark, path, batch, idCol, textCol, minEstFp4).localCheckpoint()
      kept.write.mode("append").parquet(outPath)
      if (appendToIndex && !kept.isEmpty) { append(kept, idCol, textCol, path); () }
    }
    checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }
}
