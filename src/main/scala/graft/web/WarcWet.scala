package graft.web

import java.io.{ByteArrayOutputStream, RandomAccessFile}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed reader for WARC/WET files — the Common Crawl wire
  * format, i.e. THE 100 TB web-corpus input. A `.warc.wet.gz` shard
  * is a CONCATENATION of per-record gzip members (each record its own
  * deflate stream), which is what makes planet-scale shards
  * splittable at all: any byte offset that starts a member can be
  * inflated independently of everything before it.
  *
  * Split-scan contract (the Hadoop text-split shape, like
  * [[graft.osm.OsmPbf]]'s blob ranges): the file divides into byte
  * ranges, each task scans ITS range for gzip member starts and owns
  * every member whose FIRST byte lies inside the range — a member may
  * extend past the range end (the task keeps reading; ranges only
  * partition ownership, not IO). Exactly-once by construction, no
  * driver-side pass over the data.
  *
  * A candidate offset (`1f 8b 08` magic + plausible flag byte) is
  * accepted only if the member INFLATES cleanly from there AND the
  * payload starts with `WARC/`. Deflate output matching both by
  * accident is practically impossible, so false-positive magics
  * inside compressed bytes are rejected by the attempt itself;
  * corrupt members are skipped (scan resumes past the magic), never
  * fatal — the same drop-don't-throw contract as every parser here.
  *
  * Output: (url, warc_type, date, length, text) — one row per
  * conversion/response record; `length` is the payload byte count.
  * Header parse is tolerant: missing headers surface as null.
  */
object WarcWet {

  final case class WetRecord(url: String, warc_type: String, date: String,
                             length: Long, text: String)

  /** Per-member inflate cap — a corrupt or hostile member claiming a
    * multi-GB payload drops (null) instead of OOMing the task; real
    * WET records are page-sized. */
  private val MaxMemberBytes = 64 * 1024 * 1024

  // ---- member scan + inflate ----------------------------------------

  /** Inflate ONE gzip member starting at `off`; returns (payload,
    * nextOffset) or null when `off` does not start a valid member.
    * Reads through `raf` — the member may extend past any caller
    * range; gzip's own CRC32 + ISIZE trailer validate the content. */
  private[web] def inflateMember(raf: RandomAccessFile, off: Long, fileLen: Long): (Array[Byte], Long) = {
    if (off + 18 > fileLen) return null // minimal member: 10 header + 8 trailer
    raf.seek(off)
    val head = new Array[Byte](10)
    raf.readFully(head)
    if ((head(0) & 0xff) != 0x1f || (head(1) & 0xff) != 0x8b || head(2) != 8) return null
    val flg = head(3) & 0xff
    if ((flg & 0xe0) != 0) return null // reserved flag bits must be zero
    var p = off + 10
    try {
      // optional fields in flag order: FEXTRA, FNAME, FCOMMENT, FHCRC
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        raf.seek(p)
        val xlen = (raf.read() | (raf.read() << 8))
        if (xlen < 0) return null
        p += 2 + xlen
      }
      def skipZeroTerminated(from: Long): Long = {
        raf.seek(from)
        var q = from
        var b = raf.read()
        while (b > 0) { q += 1; b = raf.read() }
        if (b < 0) -1L else q + 1
      }
      if ((flg & 8) != 0) { p = skipZeroTerminated(p); if (p < 0) return null }
      if ((flg & 16) != 0) { p = skipZeroTerminated(p); if (p < 0) return null }
      if ((flg & 2) != 0) p += 2 // FHCRC
      if (p >= fileLen) return null
      // the Inflater's native context must be freed on EVERY exit —
      // including the reject paths: this runs once per CANDIDATE
      // offset, and false-positive gzip magics inside compressed
      // bytes are routine at corpus scale, so a reject-path leak here
      // is the read-side twin of the per-record Deflater leak the
      // writer once had
      val inf = new java.util.zip.Inflater(true)
      val out = new ByteArrayOutputStream()
      val crc = new java.util.zip.CRC32()
      var consumedEnd = p
      try {
        val in = new Array[Byte](64 * 1024)
        val buf = new Array[Byte](64 * 1024)
        var at = p
        raf.seek(p)
        while (!inf.finished()) {
          if (inf.needsInput()) {
            if (at >= fileLen) return null // truncated member
            raf.seek(at)
            val n = raf.read(in, 0, math.min(in.length.toLong, fileLen - at).toInt)
            if (n <= 0) return null
            inf.setInput(in, 0, n)
            at += n
          }
          val n = inf.inflate(buf)
          if (n > 0) { out.write(buf, 0, n); crc.update(buf, 0, n) }
          else if (n == 0 && inf.needsDictionary()) return null
          if (out.size() > MaxMemberBytes) return null // runaway/hostile member
        }
        consumedEnd = at - inf.getRemaining
      } finally inf.end()
      // trailer: CRC32 + ISIZE (mod 2^32), little-endian
      if (consumedEnd + 8 > fileLen) return null
      raf.seek(consumedEnd)
      val tr = new Array[Byte](8)
      raf.readFully(tr)
      def le32(o: Int): Long =
        (tr(o) & 0xffL) | ((tr(o + 1) & 0xffL) << 8) | ((tr(o + 2) & 0xffL) << 16) | ((tr(o + 3) & 0xffL) << 24)
      val payload = out.toByteArray
      if (le32(0) != crc.getValue) return null
      if (le32(4) != (payload.length.toLong & 0xffffffffL)) return null
      (payload, consumedEnd + 8)
    } catch { case _: java.util.zip.DataFormatException => null }
  }

  /** Parse one WARC record's bytes (headers CRLF-separated, blank
    * line, body). Null when the payload is not a WARC record. */
  private[web] def parseRecord(payload: Array[Byte]): WetRecord = {
    if (payload.length < 5 || new String(payload, 0, 5, "US-ASCII") != "WARC/") return null
    val sep = "\r\n\r\n".getBytes("US-ASCII")
    var cut = -1
    var i = 0
    while (cut < 0 && i + 4 <= payload.length) {
      if (payload(i) == sep(0) && payload(i + 1) == sep(1) &&
          payload(i + 2) == sep(2) && payload(i + 3) == sep(3)) cut = i
      i += 1
    }
    if (cut < 0) return null
    val headerText = new String(payload, 0, cut, "UTF-8")
    val body = new String(payload, cut + 4, payload.length - cut - 4, "UTF-8")
    val headers = headerText.split("\r\n").drop(1).flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None else Some(line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim)
    }.toMap
    WetRecord(
      url = headers.getOrElse("warc-target-uri", null),
      warc_type = headers.getOrElse("warc-type", null),
      date = headers.getOrElse("warc-date", null),
      length = body.getBytes("UTF-8").length.toLong,
      text = body)
  }

  /** Scan `[start, end)` for member starts and decode every member
    * OWNED by the range (first byte inside it). The scan walks
    * candidate magics; a validated member fast-forwards the scan to
    * its end when that end is still owned. */
  private[web] def scanRange(path: String, start: Long, end: Long): Iterator[WetRecord] = {
    val raf = new RandomAccessFile(path, "r")
    val fileLen = raf.length()
    val out = Seq.newBuilder[WetRecord]
    try {
      // the magic scan runs over ONE buffered read of the owned range
      // (+2 bytes so a magic straddling the end boundary is still
      // seen by its owner); only validated candidates touch raf again
      val scanEnd = math.min(end + 2, fileLen)
      val win = new Array[Byte]((scanEnd - start).toInt.max(0))
      raf.seek(start)
      raf.readFully(win)
      var pos = start
      while (pos < end && pos + 2 < fileLen) {
        val i = (pos - start).toInt
        if (win(i) == 0x1f.toByte && win(i + 1) == 0x8b.toByte && win(i + 2) == 8.toByte) {
          inflateMember(raf, pos, fileLen) match {
            case null => pos += 1
            case (payload, next) =>
              val rec = parseRecord(payload)
              if (rec == null) pos += 1
              else { out += rec; pos = next }
          }
        } else pos += 1
      }
      out.result().iterator
    } finally raf.close()
  }

  /** Distributed read: `rangeBytes` controls task granularity (one
    * range ≈ one task; the default targets parquet-like splits). At
    * 100 TB this is N shards × (size/rangeBytes) tasks with zero
    * driver-side data movement — the driver ships (path, start, end)
    * triples only. */
  def read(spark: SparkSession, path: String,
           rangeBytes: Long = 32L * 1024 * 1024,
           requireManifest: Boolean = true): DataFrame = {
    import spark.implicits._
    require(rangeBytes >= 1, s"rangeBytes $rangeBytes must be >= 1")
    // a directory reads as the union of its shards' ranges (the
    // multi-shard crawl layout) and is GATED on the export manifest
    // (a killed writeSharded leaves shards but no manifest; a deleted
    // or truncated shard mismatches it — either way the read throws
    // instead of returning a silently incomplete corpus; pass
    // requireManifest = false only for externally produced crawl
    // dirs). A file reads as its own ranges, no manifest involved.
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory) {
        if (requireManifest || graft.sources.ExportManifest.read(spark, path).isDefined)
          graft.sources.ExportManifest.verify(spark, path)
            .map(e => new java.io.File(f, e.file).getAbsolutePath).sorted
        else
          Option(f.listFiles()).toSeq.flatten
            .filter(x => x.isFile && x.getName.endsWith(".warc.wet.gz"))
            .map(_.getAbsolutePath).sorted
      } else Seq(path)
    val ranges = files.flatMap { p =>
      val len = new java.io.File(p).length()
      (0L until math.max(1L, (len + rangeBytes - 1) / rangeBytes))
        .map(i => (p, i * rangeBytes, math.min((i + 1) * rangeBytes, len)))
    }
    spark.createDataset(ranges)
      .flatMap { case (p, s, e) => scanRange(p, s, e) }
      .toDF()
  }

  /** Distributed sharded export: every partition streams its rows
    * into ONE self-contained multi-member `.warc.wet.gz` shard —
    * the Common Crawl layout, so each output shard is independently
    * [[read]]-able and split-scannable. Input needs columns
    * (url, warc_type, date, text); rows stream straight to the gzip
    * sink (no per-partition buffering).
    *
    * The byte sink goes through the Hadoop FileSystem resolved from
    * `dir` (no java.io in the write path), so the export works on
    * any Hadoop-addressable store: each task writes to an
    * ATTEMPT-UNIQUE `.part-*-<attempt>.tmp` name and renames into
    * place — a retried or speculative attempt never corrupts a
    * committed shard, and the rename is the per-shard commit.
    * Returns the shard file paths. */
  def writeSharded(df: DataFrame, dir: String): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(hconf)
    dfs.mkdirs(dirPath)
    // re-export discipline: the OLD manifest dies FIRST (a re-run
    // killed mid-write must read as incomplete, not as the previous
    // export), then stale shards from a wider previous run go (run 2
    // may produce fewer partitions — a lingering part-00002 from run
    // 1 must not sit next to a manifest that doesn't list it), plus
    // task temps stranded by a killed prior run
    graft.sources.ExportManifest.invalidate(spark, dir)
    dfs.listStatus(dirPath).map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.matches("part-\\d+\\.warc\\.wet\\.gz") ||
          (n.startsWith(".part-") && n.endsWith(".tmp"))
      }
      .foreach(p => dfs.delete(p, false))
    // the Hadoop conf travels to the tasks as plain pairs (the conf
    // object itself is not serializable): scheme handlers + any
    // driver-set store credentials resolve identically executor-side
    val confPairs = {
      import scala.jdk.CollectionConverters._
      hconf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    }
    val d = dir
    val shardNames = df.select("url", "warc_type", "date", "text")
      .as[(String, String, String, String)]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confPairs.foreach { case (k, v) => conf.set(k, v) }
        val dp = new Path(d)
        // a task-PRIVATE FileSystem instance (not the JVM-shared cache
        // entry getFileSystem returns): setWriteChecksum below mutates
        // the instance, and flipping it on the cached one would turn
        // off .crc sidecars for every other writer in this executor
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(dp.toUri, conf)
        try {
          val finalName = f"part-${tc.partitionId()}%05d.warc.wet.gz"
          val tmp = new Path(dp, f".part-${tc.partitionId()}%05d-${tc.taskAttemptId()}%d.tmp")
          var n = 0L
          // each gzip member carries its own CRC32 (verified at read,
          // [[inflateMember]]); Hadoop's local ChecksumFileSystem .crc
          // sidecar on top of that is pure duplicate I/O — off
          fs.setWriteChecksum(false)
          val fos = new java.io.BufferedOutputStream(fs.create(tmp, true), 256 * 1024)
          val mw = new MemberWriter(fos)
          try it.foreach { case (url, typ, date, text) =>
            mw.writeMember(recordPayload(url, typ, date, text))
            n += 1
          } finally { try mw.end() finally fos.close() }
          if (n == 0) { fs.delete(tmp, false); Iterator.empty }
          else {
            val fin = new Path(dp, finalName)
            fs.delete(fin, false) // a lost earlier attempt's commit: last wins
            if (!fs.rename(tmp, fin))
              throw new java.io.IOException(s"commit rename $tmp -> $fin failed")
            Iterator.single(finalName)
          }
        } finally fs.close()
      }
      .collect().toSeq.sorted // one name per non-empty partition — driver-sized
    // the completeness manifest goes in LAST, once every shard is on
    // disk (the _append_pending discipline applied to exports): a job
    // killed mid-write leaves shards but no manifest, so the
    // directory can never pass [[read]]'s gate as a complete export
    graft.sources.ExportManifest.write(spark, dir,
      shardNames.map { nme =>
        graft.sources.ExportManifest.Entry(nme, dfs.getFileStatus(new Path(dirPath, nme)).getLen)
      }, format = "warc/wet-sharded")
    shardNames.map(nme => s"$d/$nme")
  }

  // ---- member writer --------------------------------------------------

  /** Streams per-record gzip members through ONE reused native
    * `Deflater` (nowrap) with hand-rolled framing — the header /
    * trailer mirror exactly what [[inflateMember]] validates. A
    * per-record `GZIPOutputStream` would allocate a fresh native
    * zlib context per record and never `Deflater.end()` it (closing
    * the stream would close the underlying sink): tens of thousands
    * of un-freed native contexts per task at corpus scale. One
    * context per task, `reset()` per member, `end()` once. */
  private[web] final class MemberWriter(out: java.io.OutputStream) {
    private val def_ = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    private val crc = new java.util.zip.CRC32()
    private val buf = new Array[Byte](64 * 1024)
    // magic 1f 8b, CM=deflate, FLG=0, MTIME=0, XFL=0, OS=unknown
    private val header = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)

    def writeMember(payload: Array[Byte]): Unit = {
      out.write(header)
      def_.reset()
      def_.setInput(payload)
      def_.finish()
      while (!def_.finished()) {
        val n = def_.deflate(buf)
        if (n > 0) out.write(buf, 0, n)
      }
      crc.reset()
      crc.update(payload)
      le32(crc.getValue)
      le32(payload.length.toLong & 0xffffffffL)
    }
    private def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    /** Frees the native context; does NOT close `out`. */
    def end(): Unit = def_.end()
  }

  private def recordPayload(url: String, typ: String, date: String, text: String): Array[Byte] = {
    val body = Option(text).getOrElse("")
    val headers = Seq(
      "WARC/1.0",
      s"WARC-Type: ${Option(typ).getOrElse("conversion")}",
      Option(url).map(u => s"WARC-Target-URI: $u").getOrElse(""),
      Option(date).map(x => s"WARC-Date: $x").getOrElse(""),
      s"Content-Length: ${body.getBytes("UTF-8").length}").filter(_.nonEmpty)
    (headers.mkString("\r\n") + "\r\n\r\n" + body).getBytes("UTF-8")
  }

  // ---- writer (driver-side; fixtures / small exports) ----------------

  /** Write records as a multi-member `.warc.wet.gz`: one gzip member
    * per record, concatenated — the Common Crawl layout, so the file
    * round-trips through [[read]] and stays split-scannable. */
  def write(path: String, records: Seq[WetRecord]): Unit = {
    val fos = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path), 256 * 1024)
    val mw = new MemberWriter(fos)
    try records.foreach { r =>
      mw.writeMember(recordPayload(r.url, r.warc_type, r.date, r.text))
    } finally { try mw.end() finally fos.close() }
  }
}
