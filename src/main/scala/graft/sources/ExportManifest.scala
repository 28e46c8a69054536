package graft.sources

import org.apache.spark.sql.SparkSession

/** Completeness manifest for multi-file (sharded) exports — the
  * `_append_pending` crash-recovery discipline applied to exports: a
  * sharded writer that dies mid-job must not leave a directory that
  * READS as a complete export. Parquet gets this from the committer's
  * `_SUCCESS`; the hand-rolled shard writers (`.warc.wet.gz` crawl
  * shards, `.osc` changefile shards) get it here.
  *
  * Protocol:
  *   - the WRITER writes `_export_manifest.json` LAST, after every
  *     shard file is in place, via temp file + atomic rename (readers
  *     see the old manifest, the new one, or none — never a torn one);
  *   - the READER calls [[verify]] before consuming a directory: no
  *     manifest → the export never finished (or predates the
  *     discipline); a listed file missing or size-mismatched → a
  *     partial re-run or concurrent delete tore it. Either way the
  *     consumer gets an exception naming the problem instead of a
  *     silently truncated corpus.
  *
  * The manifest lists (relative path, byte size) per file; byte sizes
  * catch the truncated-but-present case (a killed stream writer
  * leaves a short file behind on POSIX; object-store writers surface
  * it as a failed rename instead).
  */
object ExportManifest {

  val Name = "_export_manifest.json"

  final case class Entry(file: String, bytes: Long)

  private val entryRe = """\{"file":"((?:[^"\\]|\\.)+)","bytes":(\d+)\}""".r

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Drop any manifest left by a PREVIOUS export — writers call this
    * FIRST, before touching a shard. Without it, a re-export killed
    * mid-job would leave the OLD manifest verifying against old (or
    * byte-size-coincident) shard files, and the torn re-run would
    * read as a complete export — the exact window the manifest
    * exists to close. */
  def invalidate(spark: SparkSession, dir: String): Unit = {
    val (dirPath, fs) = fsOf(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(dirPath, Name), false)
    ()
  }

  /** Write the manifest — call ONLY after every listed file is fully
    * in place. Atomic: temp file + FileContext rename with OVERWRITE
    * (the same discipline as [[graft.similarity.IvfIndex.flipPointer]]). */
  def write(spark: SparkSession, dir: String, entries: Seq[Entry],
            format: String): Unit = {
    val (dirPath, fs) = fsOf(spark, dir)
    val json = s"""{"format":"${esc(format)}","n_files":${entries.length},"files":[""" +
      entries.sortBy(_.file)
        .map(e => s"""{"file":"${esc(e.file)}","bytes":${e.bytes}}""").mkString(",") + "]}"
    val tmp = new org.apache.hadoop.fs.Path(dirPath, Name + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dirPath.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(dirPath, Name),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The manifest's entries, or None when the directory carries no
    * manifest (export never completed, or predates the discipline). */
  def read(spark: SparkSession, dir: String): Option[Seq[Entry]] = {
    val (dirPath, fs) = fsOf(spark, dir)
    val mPath = new org.apache.hadoop.fs.Path(dirPath, Name)
    if (!fs.exists(mPath)) return None
    val in = fs.open(mPath)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Some(entryRe.findAllMatchIn(json)
      .map(m => Entry(unesc(m.group(1)), m.group(2).toLong)).toSeq)
  }

  /** Gate a directory read: throws [[IllegalStateException]] naming
    * the first problem — absent manifest (incomplete export), a
    * listed file missing, or a byte-size mismatch. Returns the
    * verified entries so callers can consume exactly the manifest's
    * file list (never a directory listing that may contain strays). */
  def verify(spark: SparkSession, dir: String): Seq[Entry] = {
    val entries = read(spark, dir).getOrElse(throw new IllegalStateException(
      s"$dir has no $Name — the export job never completed (torn export?)"))
    val (dirPath, fs) = fsOf(spark, dir)
    entries.foreach { e =>
      val p = new org.apache.hadoop.fs.Path(dirPath, e.file)
      if (!fs.exists(p)) throw new IllegalStateException(
        s"torn export in $dir: manifest lists ${e.file} (${e.bytes} bytes) but it is missing")
      val len = fs.getFileStatus(p).getLen
      if (len != e.bytes) throw new IllegalStateException(
        s"torn export in $dir: ${e.file} is $len bytes, manifest says ${e.bytes}")
    }
    entries
  }
}
