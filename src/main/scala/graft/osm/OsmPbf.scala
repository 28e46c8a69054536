package graft.osm

import java.io.RandomAccessFile
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed `.osm.pbf` source — the reference's ACTUAL input format
  * (changegen reads the source extract with osmium,
  * changegen/generator.py:35-53, __main__.py:26-53).
  *
  * Format (public OSMPBF spec): a sequence of independent blobs, each
  * framed as [4-byte BE header length][BlobHeader proto][Blob proto],
  * where OSMData blobs hold a zlib-compressed PrimitiveBlock (string
  * table + dense/plain nodes, ways, relations; coordinates and ids
  * delta/zigzag-coded). Wire decoding is a ~100-line hand-rolled
  * protobuf-lite reader — no codegen, no external dependency.
  *
  * Scale shape: the DRIVER reads only the blob headers (a seek loop —
  * O(#blobs) tiny reads, no payload), yielding a (offset, size) split
  * index; EXECUTORS open the file, read their byte ranges, inflate and
  * decode in parallel — the same split model Hadoop uses, so one
  * planet-scale file fans out across the cluster. The path must be
  * visible to executors (local mode, NFS/DFS mounts).
  */
object OsmPbf {

  // ---- protobuf-lite primitives -------------------------------------

  /** Cursor over a byte range; varint/field-level reads. */
  private final class R(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var res = 0L
      var b = 0
      do {
        b = buf(pos); pos += 1
        res |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    def sub(): R = { val len = varint().toInt; val r = new R(buf, pos, pos + len); pos += len; r }
    def str(): String = { val len = varint().toInt; val s = new String(buf, pos, len, "UTF-8"); pos += len; s }
    def skip(wire: Int): Unit = (wire: @unchecked) match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 =>
        // NOT `pos += varint()`: Scala reads the old `pos` before
        // varint() advances it, which would land short by the width
        // of the length prefix itself
        val len = varint().toInt
        pos += len
      case 5 => pos += 4
    }
  }

  private def zz(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Repeated varint field, packed (wire 2) or single (wire 0). */
  private def repVarints(r: R, wire: Int, zigzag: Boolean, out: collection.mutable.ArrayBuffer[Long]): Unit =
    if (wire == 2) { val s = r.sub(); while (s.hasMore) { val v = s.varint(); out += (if (zigzag) zz(v) else v) } }
    else { val v = r.varint(); out += (if (zigzag) zz(v) else v) }

  // ---- driver-side split index --------------------------------------

  /** (payload offset, payload size) of every OSMData blob — reads ONLY
    * the 4-byte lengths and BlobHeaders, seeking over payloads. */
  private[osm] def blobIndex(path: String): Seq[(Long, Int)] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val out = Seq.newBuilder[(Long, Int)]
      val len = raf.length()
      while (raf.getFilePointer < len) {
        val hlen = raf.readInt()
        val hbytes = new Array[Byte](hlen)
        raf.readFully(hbytes)
        val hr = new R(hbytes, 0, hlen)
        var typ = ""
        var datasize = 0
        while (hr.hasMore) {
          val tag = hr.varint().toInt
          (tag >> 3, tag & 7) match {
            case (1, 2) => typ = hr.str()
            case (3, 0) => datasize = hr.varint().toInt
            case (_, w) => hr.skip(w)
          }
        }
        val off = raf.getFilePointer
        if (typ == "OSMData") out += ((off, datasize))
        raf.seek(off + datasize)
      }
      out.result()
    } finally raf.close()
  }

  // ---- executor-side blob decode ------------------------------------

  private[osm] def blobData(path: String, off: Long, size: Int): Array[Byte] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      raf.seek(off)
      val b = new Array[Byte](size)
      raf.readFully(b)
      val r = new R(b, 0, size)
      var raw: Array[Byte] = null
      var rawSize = -1
      var zOff = -1
      var zLen = -1
      while (r.hasMore) {
        val tag = r.varint().toInt
        (tag >> 3, tag & 7) match {
          case (1, 2) => val l = r.varint().toInt; raw = java.util.Arrays.copyOfRange(b, r.pos, r.pos + l); r.pos += l
          case (2, 0) => rawSize = r.varint().toInt
          case (3, 2) => zLen = r.varint().toInt; zOff = r.pos; r.pos += zLen
          case (_, w) => r.skip(w)
        }
      }
      if (raw != null) raw
      else {
        require(zOff >= 0 && rawSize >= 0, "blob has neither raw nor zlib_data")
        val inf = new Inflater()
        inf.setInput(b, zOff, zLen)
        val out = new Array[Byte](rawSize)
        var n = 0
        while (n < rawSize && !inf.finished()) {
          val k = inf.inflate(out, n, rawSize - n)
          // inflate() == 0 with needsInput set means truncated/corrupt
          // zlib data — finished() never turns true, so bail instead
          // of spinning forever
          if (k == 0) { inf.end(); throw new java.io.IOException("truncated or corrupt zlib blob") }
          n += k
        }
        inf.end()
        out
      }
    } finally raf.close()
  }

  private[osm] final case class Block(
      nodes: Seq[OsmModel.Node], ways: Seq[OsmModel.Way], relations: Seq[OsmModel.Relation])

  private[osm] def decodeBlock(data: Array[Byte]): Block = {
    // pass 1: string table + coordinate scaling (fields may follow the
    // groups in a legal encoding)
    var strings = Array("")
    var gran = 100L
    var latOff = 0L
    var lonOff = 0L
    locally {
      val r = new R(data, 0, data.length)
      while (r.hasMore) {
        val tag = r.varint().toInt
        (tag >> 3, tag & 7) match {
          case (1, 2) =>
            val st = r.sub()
            val ss = collection.mutable.ArrayBuffer[String]()
            while (st.hasMore) {
              val t2 = st.varint().toInt
              if ((t2 >> 3) == 1 && (t2 & 7) == 2) ss += st.str() else st.skip(t2 & 7)
            }
            strings = ss.toArray
          case (17, 0) => gran = r.varint()
          case (19, 0) => latOff = r.varint()
          case (20, 0) => lonOff = r.varint()
          case (_, w) => r.skip(w)
        }
      }
    }
    def coord(off: Long, units: Long): Double = 0.000000001 * (off + gran * units)
    def tagMap(keys: Seq[Long], vals: Seq[Long]): Map[String, String] =
      keys.zip(vals).map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap

    val nodes = Seq.newBuilder[OsmModel.Node]
    val ways = Seq.newBuilder[OsmModel.Way]
    val rels = Seq.newBuilder[OsmModel.Relation]

    val r = new R(data, 0, data.length)
    while (r.hasMore) {
      val tag = r.varint().toInt
      (tag >> 3, tag & 7) match {
        case (2, 2) => // PrimitiveGroup
          val g = r.sub()
          while (g.hasMore) {
            val gt = g.varint().toInt
            (gt >> 3, gt & 7) match {
              case (1, 2) => // plain Node
                val n = g.sub()
                var id = 0L; var lat = 0L; var lon = 0L; var ver = 1
                val ks = collection.mutable.ArrayBuffer[Long]()
                val vs = collection.mutable.ArrayBuffer[Long]()
                while (n.hasMore) {
                  val t = n.varint().toInt
                  (t >> 3, t & 7) match {
                    case (1, 0) => id = zz(n.varint())
                    case (2, w) => repVarints(n, w, zigzag = false, ks)
                    case (3, w) => repVarints(n, w, zigzag = false, vs)
                    case (4, 2) =>
                      val info = n.sub()
                      while (info.hasMore) {
                        val it = info.varint().toInt
                        if ((it >> 3) == 1 && (it & 7) == 0) ver = info.varint().toInt else info.skip(it & 7)
                      }
                    case (8, 0) => lat = zz(n.varint())
                    case (9, 0) => lon = zz(n.varint())
                    case (_, w) => n.skip(w)
                  }
                }
                nodes += OsmModel.Node(id, ver, coord(latOff, lat), coord(lonOff, lon), tagMap(ks.toSeq, vs.toSeq))
              case (2, 2) => // DenseNodes
                val d = g.sub()
                val ids = collection.mutable.ArrayBuffer[Long]()
                val lats = collection.mutable.ArrayBuffer[Long]()
                val lons = collection.mutable.ArrayBuffer[Long]()
                val kvs = collection.mutable.ArrayBuffer[Long]()
                val vers = collection.mutable.ArrayBuffer[Long]()
                while (d.hasMore) {
                  val t = d.varint().toInt
                  (t >> 3, t & 7) match {
                    case (1, w) => repVarints(d, w, zigzag = true, ids)
                    case (5, 2) =>
                      val di = d.sub()
                      while (di.hasMore) {
                        val dt = di.varint().toInt
                        if ((dt >> 3) == 1) repVarints(di, dt & 7, zigzag = false, vers) else di.skip(dt & 7)
                      }
                    case (8, w) => repVarints(d, w, zigzag = true, lats)
                    case (9, w) => repVarints(d, w, zigzag = true, lons)
                    case (10, w) => repVarints(d, w, zigzag = false, kvs)
                    case (_, w) => d.skip(w)
                  }
                }
                // delta-decode; keys_vals is a single stream of
                // (k,v)* 0 runs, one run per node (absent → no tags)
                var id = 0L; var la = 0L; var lo = 0L
                var kv = 0
                var i = 0
                while (i < ids.length) {
                  id += ids(i); la += lats(i); lo += lons(i)
                  val tags = Map.newBuilder[String, String]
                  if (kvs.nonEmpty) {
                    while (kv < kvs.length && kvs(kv) != 0L) {
                      tags += strings(kvs(kv).toInt) -> strings(kvs(kv + 1).toInt)
                      kv += 2
                    }
                    kv += 1 // consume the 0 terminator
                  }
                  val ver = if (i < vers.length) vers(i).toInt else 1
                  nodes += OsmModel.Node(id, ver, coord(latOff, la), coord(lonOff, lo), tags.result())
                  i += 1
                }
              case (3, 2) => // Way
                val w0 = g.sub()
                var id = 0L; var ver = 1
                val ks = collection.mutable.ArrayBuffer[Long]()
                val vs = collection.mutable.ArrayBuffer[Long]()
                val refs = collection.mutable.ArrayBuffer[Long]()
                while (w0.hasMore) {
                  val t = w0.varint().toInt
                  (t >> 3, t & 7) match {
                    case (1, 0) => id = w0.varint() // int64, no zigzag
                    case (2, w) => repVarints(w0, w, zigzag = false, ks)
                    case (3, w) => repVarints(w0, w, zigzag = false, vs)
                    case (4, 2) =>
                      val info = w0.sub()
                      while (info.hasMore) {
                        val it = info.varint().toInt
                        if ((it >> 3) == 1 && (it & 7) == 0) ver = info.varint().toInt else info.skip(it & 7)
                      }
                    case (8, w) => repVarints(w0, w, zigzag = true, refs)
                    case (_, w) => w0.skip(w)
                  }
                }
                var ref = 0L
                val nds = refs.map { d => ref += d; ref }
                ways += OsmModel.Way(id, ver, nds.toSeq, tagMap(ks.toSeq, vs.toSeq))
              case (4, 2) => // Relation
                val rel = g.sub()
                var id = 0L; var ver = 1
                val ks = collection.mutable.ArrayBuffer[Long]()
                val vs = collection.mutable.ArrayBuffer[Long]()
                val roles = collection.mutable.ArrayBuffer[Long]()
                val memids = collection.mutable.ArrayBuffer[Long]()
                val types = collection.mutable.ArrayBuffer[Long]()
                while (rel.hasMore) {
                  val t = rel.varint().toInt
                  (t >> 3, t & 7) match {
                    case (1, 0) => id = rel.varint()
                    case (2, w) => repVarints(rel, w, zigzag = false, ks)
                    case (3, w) => repVarints(rel, w, zigzag = false, vs)
                    case (4, 2) =>
                      val info = rel.sub()
                      while (info.hasMore) {
                        val it = info.varint().toInt
                        if ((it >> 3) == 1 && (it & 7) == 0) ver = info.varint().toInt else info.skip(it & 7)
                      }
                    case (8, w) => repVarints(rel, w, zigzag = false, roles)
                    case (9, w) => repVarints(rel, w, zigzag = true, memids)
                    case (10, w) => repVarints(rel, w, zigzag = false, types)
                    case (_, w) => rel.skip(w)
                  }
                }
                var mem = 0L
                val members = memids.zipWithIndex.map { case (d, i) =>
                  mem += d
                  val mtype = types(i) match { case 0 => "node"; case 1 => "way"; case _ => "relation" }
                  OsmModel.Member(mem, mtype, strings(roles(i).toInt))
                }
                rels += OsmModel.Relation(id, ver, members.toSeq, tagMap(ks.toSeq, vs.toSeq))
              case (_, w) => g.skip(w)
            }
          }
        case (_, w) => r.skip(w)
      }
    }
    Block(nodes.result(), ways.result(), rels.result())
  }

  // ---- Spark surface -------------------------------------------------

  private def blocks(spark: SparkSession, path: String): Dataset[(Long, Int)] = {
    val s = spark; import s.implicits._
    spark.createDataset(blobIndex(path))
  }

  def nodes(spark: SparkSession, path: String): Dataset[OsmModel.Node] = {
    val s = spark; import s.implicits._
    val p = path
    blocks(spark, path).flatMap { case (off, size) => decodeBlock(blobData(p, off, size)).nodes }
  }

  def ways(spark: SparkSession, path: String): Dataset[OsmModel.Way] = {
    val s = spark; import s.implicits._
    val p = path
    blocks(spark, path).flatMap { case (off, size) => decodeBlock(blobData(p, off, size)).ways }
  }

  def relations(spark: SparkSession, path: String): Dataset[OsmModel.Relation] = {
    val s = spark; import s.implicits._
    val p = path
    blocks(spark, path).flatMap { case (off, size) => decodeBlock(blobData(p, off, size)).relations }
  }

  // ---- writer (driver-side; tests / small exports) -------------------

  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    def byte(b: Int): Unit = out.write(b)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b) }
    def strField(field: Int, s: String): Unit = bytesField(field, s.getBytes("UTF-8"))
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def packed(field: Int, vs: Seq[Long], zigzag: Boolean): Unit = if (vs.nonEmpty) {
      val inner = new W
      vs.foreach(v => inner.varint(if (zigzag) (v << 1) ^ (v >> 63) else v))
      bytesField(field, inner.bytes)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    // worst case for incompressible input: ~5 bytes per 16K block + 6
    // overhead — raw.length + 64 was NOT enough for large blocks
    val buf = new Array[Byte](raw.length + (raw.length >> 10) * 6 + 128)
    var n = 0
    while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private def writeBlob(os: java.io.DataOutputStream, typ: String, payload: Array[Byte]): Unit = {
    val blob = new W
    blob.varintField(2, payload.length)
    blob.bytesField(3, deflate(payload))
    val blobBytes = blob.bytes
    val header = new W
    header.strField(1, typ)
    header.varintField(3, blobBytes.length)
    val headerBytes = header.bytes
    os.writeInt(headerBytes.length)
    os.write(headerBytes)
    os.write(blobBytes)
  }

  /** Write a `.osm.pbf` (dense nodes, ways, relations; zlib blocks of
    * `blockSize` elements). Driver-side utility for fixtures and small
    * exports — the scale export path remains the sharded `.osc` sink.
    * Coordinates are stored at the standard granularity (100 nano-
    * degrees), so lat/lon round-trip at 1e-7 degree resolution.
    */
  def write(path: String, nodes: Seq[OsmModel.Node], ways: Seq[OsmModel.Way],
            relations: Seq[OsmModel.Relation], blockSize: Int = 8000): Unit = {
    val os = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20))
    try {
      val hb = new W
      hb.strField(4, "OsmSchema-V0.6")
      hb.strField(4, "DenseNodes")
      writeBlob(os, "OSMHeader", hb.bytes)

      def block(build: (W, Map[String, Int]) => Unit, strings: Seq[String]): Unit = {
        // index 0 is ALWAYS the empty string (OSMPBF convention); the
        // data strings must exclude it or the table would have a gap
        val uniq = "" +: strings.distinct.filterNot(_.isEmpty)
        val table = uniq.zipWithIndex.toMap
        val b = new W
        val st = new W
        uniq.foreach(s => st.strField(1, s))
        b.bytesField(1, st.bytes)
        build(b, table)
        writeBlob(os, "OSMData", b.bytes)
      }

      nodes.grouped(blockSize).foreach { ns =>
        block((b, table) => {
          val dense = new W
          dense.packed(1, deltas(ns.map(_.id)), zigzag = true)
          val di = new W
          di.packed(1, ns.map(_.version.toLong), zigzag = false)
          dense.bytesField(5, di.bytes)
          dense.packed(8, deltas(ns.map(n => math.round(n.lat * 1e7))), zigzag = true)
          dense.packed(9, deltas(ns.map(n => math.round(n.lon * 1e7))), zigzag = true)
          if (ns.exists(_.tags.nonEmpty))
            dense.packed(10, ns.flatMap(n =>
              n.tags.toSeq.flatMap { case (k, v) => Seq(table(k).toLong, table(v).toLong) } :+ 0L), zigzag = false)
          val g = new W
          g.bytesField(2, dense.bytes)
          b.bytesField(2, g.bytes)
        }, ns.flatMap(n => n.tags.toSeq.flatMap(t => Seq(t._1, t._2))))
      }

      ways.grouped(blockSize).foreach { ws =>
        block((b, table) => {
          val g = new W
          ws.foreach { w =>
            val wm = new W
            wm.varintField(1, w.id)
            wm.packed(2, w.tags.keys.map(k => table(k).toLong).toSeq, zigzag = false)
            wm.packed(3, w.tags.values.map(v => table(v).toLong).toSeq, zigzag = false)
            val info = new W
            info.varintField(1, w.version)
            wm.bytesField(4, info.bytes)
            wm.packed(8, deltas(w.nds), zigzag = true)
            g.bytesField(3, wm.bytes)
          }
          b.bytesField(2, g.bytes)
        }, ws.flatMap(w => w.tags.toSeq.flatMap(t => Seq(t._1, t._2))))
      }

      relations.grouped(blockSize).foreach { rs =>
        block((b, table) => {
          val g = new W
          rs.foreach { rel =>
            val rm = new W
            rm.varintField(1, rel.id)
            rm.packed(2, rel.tags.keys.map(k => table(k).toLong).toSeq, zigzag = false)
            rm.packed(3, rel.tags.values.map(v => table(v).toLong).toSeq, zigzag = false)
            val info = new W
            info.varintField(1, rel.version)
            rm.bytesField(4, info.bytes)
            rm.packed(8, rel.members.map(m => table(m.role).toLong), zigzag = false)
            rm.packed(9, deltas(rel.members.map(_.ref)), zigzag = true)
            rm.packed(10, rel.members.map(_.mtype match {
              case "node" => 0L; case "way" => 1L; case _ => 2L
            }), zigzag = false)
            g.bytesField(4, rm.bytes)
          }
          b.bytesField(2, g.bytes)
        }, rs.flatMap(r => r.tags.toSeq.flatMap(t => Seq(t._1, t._2)) ++ r.members.map(_.role)))
      }
    } finally os.close()
  }

  private def deltas(vs: Seq[Long]): Seq[Long] =
    vs.zip(0L +: vs.dropRight(1)).map { case (v, prev) => v - prev }
}
