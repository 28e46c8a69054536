package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with
  * typed metadata — the training-data-pipeline pattern: payloads stay
  * as `binary` columns, light header fields are extracted columnar
  * (codegen'd — no UDF), and heavy decode runs batched per partition
  * ([[decodeBatched]]).
  *
  * Header parsing is REAL for all three supported containers: PNG
  * IHDR big-endian dims, JPEG SOF0/SOF2 dims behind a bounded
  * variable-length segment walk, and GIF logical-screen little-endian
  * dims — all hex()/conv() over binary slices, so every parser is
  * codegen'd, distributes, and survives pushdown.
  */
object Multimodal {

  /** Big-endian uint32 at 1-based byte offset `off` of a binary col. */
  def beU32(payload: Column, off: Int): Column =
    conv(hex(substring(payload, off, 4)), 16, 10).cast("long")

  /** Unsigned byte at a DYNAMIC 1-based offset (Column). */
  private def u8(payload: Column, off: Column): Column =
    conv(hex(payload.substr(off, lit(1))), 16, 10).cast("int")

  /** Big-endian uint16 at a dynamic 1-based offset. */
  private def beU16(payload: Column, off: Column): Column =
    conv(hex(payload.substr(off, lit(2))), 16, 10).cast("int")

  /** Container format from magic bytes: png/jpeg/gif/unknown. */
  def magic(payload: Column): Column =
    when(hex(substring(payload, 1, 8)) === "89504E470D0A1A0A", "png")
      .when(hex(substring(payload, 1, 2)) === "FFD8", "jpeg")
      .when(substring(payload, 1, 4).cast("string") === "GIF8", "gif")
      .otherwise("unknown")

  /** PNG IHDR dimensions: width/height are the two big-endian uint32s
    * at offsets 17 and 21 (8-byte signature + 4-byte length + "IHDR").
    * Null for non-PNG payloads.
    */
  def pngWidth(payload: Column): Column =
    when(magic(payload) === "png", beU32(payload, 17)).otherwise(lit(null))
  def pngHeight(payload: Column): Column =
    when(magic(payload) === "png", beU32(payload, 21)).otherwise(lit(null))

  /** 1-based offset of the JPEG SOF0/SOF2 marker (the 0xFF byte),
    * found by walking up to `maxSegs` variable-length marker segments
    * from SOI — a REAL segment scan (each segment's length field
    * advances the cursor), not a fixed-offset peek. The walk is a
    * bounded `aggregate` fold with a (cursor, found) struct
    * accumulator, so offsets are lambda-bound and evaluated once per
    * step (no exponential expression blow-up), and the whole parse
    * stays codegen-able columnar. Null when no SOF marker is found
    * within `maxSegs` segments or the scan runs past the payload.
    */
  def jpegSofOffset(payload: Column, maxSegs: Int = 8): Column = {
    val init = struct(lit(3).as("off"), lit(null).cast("int").as("sof"))
    aggregate(
      sequence(lit(1), lit(maxSegs)),
      init,
      (acc, _) => graft.ColumnOps.let(acc.getField("off")) { off =>
        val sof = acc.getField("sof")
        val marker = u8(payload, off + 1)
        val isSof = marker === 0xC0 || marker === 0xC2
        val live = sof.isNull && off + 3 <= length(payload) && u8(payload, off) === 0xFF
        struct(
          when(live && !isSof, off + 2 + beU16(payload, off + 2)).otherwise(off).as("off"),
          when(live && isSof, off).otherwise(sof).as("sof"))
      },
      acc => acc.getField("sof"))
  }

  /** JPEG baseline/progressive frame dimensions from the SOF segment:
    * height is the big-endian uint16 at SOF+5, width at SOF+7. A
    * payload truncated INSIDE the SOF segment (marker visible, dims
    * cut off) yields null — the same `off + 8` guard as
    * [[decodeBatched]], so the two paths agree row-for-row on
    * truncated input (a short substr would otherwise conv to a
    * garbage 1-byte dimension). */
  def jpegWidth(payload: Column, maxSegs: Int = 8): Column =
    graft.ColumnOps.let(jpegSofOffset(payload, maxSegs))(o =>
      when(o + 8 <= length(payload), beU16(payload, o + 7)).otherwise(lit(null).cast("int")))
  def jpegHeight(payload: Column, maxSegs: Int = 8): Column =
    graft.ColumnOps.let(jpegSofOffset(payload, maxSegs))(o =>
      when(o + 8 <= length(payload), beU16(payload, o + 5)).otherwise(lit(null).cast("int")))

  /** GIF logical-screen dimensions: little-endian uint16s at 1-based
    * offsets 7 and 9 ("GIF87a"/"GIF89a" + screen descriptor). */
  def gifWidth(payload: Column): Column =
    u8(payload, lit(7)) + u8(payload, lit(8)) * 256
  def gifHeight(payload: Column): Column =
    u8(payload, lit(9)) + u8(payload, lit(10)) * 256

  /** Container-dispatched image dimensions (png/jpeg/gif; null for
    * unknown containers or truncated headers). */
  def imageWidth(payload: Column): Column =
    when(magic(payload) === "png", beU32(payload, 17).cast("int"))
      .when(magic(payload) === "jpeg", jpegWidth(payload))
      .when(magic(payload) === "gif", gifWidth(payload))
      .otherwise(lit(null).cast("int"))
  def imageHeight(payload: Column): Column =
    when(magic(payload) === "png", beU32(payload, 21).cast("int"))
      .when(magic(payload) === "jpeg", jpegHeight(payload))
      .when(magic(payload) === "gif", gifHeight(payload))
      .otherwise(lit(null).cast("int"))

  /** Little-endian uint16 at 1-based byte offset `off` — hex of the
    * two bytes concatenated in reverse order. */
  private def leU16(payload: Column, off: Int): Column =
    conv(concat(hex(substring(payload, off + 1, 1)), hex(substring(payload, off, 1))), 16, 10)
      .cast("int")

  /** Little-endian uint32 at 1-based byte offset `off`. */
  private def leU32(payload: Column, off: Int): Column =
    conv(concat(
      hex(substring(payload, off + 3, 1)), hex(substring(payload, off + 2, 1)),
      hex(substring(payload, off + 1, 1)), hex(substring(payload, off, 1))), 16, 10)
      .cast("long")

  /** True for a canonical-layout PCM WAV payload: RIFF/WAVE magic with
    * the fmt chunk at offset 13 and the data chunk at offset 37 (the
    * 44-byte canonical header). Non-canonical chunk orders return
    * false — conservative, never a misparse. */
  def isWav(payload: Column): Column =
    substring(payload, 1, 4).cast("string") === "RIFF" &&
      substring(payload, 9, 4).cast("string") === "WAVE" &&
      substring(payload, 13, 4).cast("string") === "fmt " &&
      substring(payload, 37, 4).cast("string") === "data"

  def wavChannels(payload: Column): Column =
    when(isWav(payload), leU16(payload, 23)).otherwise(lit(null).cast("int"))
  def wavSampleRate(payload: Column): Column =
    when(isWav(payload), leU32(payload, 25)).otherwise(lit(null).cast("long"))
  def wavBitsPerSample(payload: Column): Column =
    when(isWav(payload), leU16(payload, 35)).otherwise(lit(null).cast("int"))
  def wavDataBytes(payload: Column): Column =
    when(isWav(payload), leU32(payload, 41)).otherwise(lit(null).cast("long"))

  /** Duration in milliseconds from the parsed header fields — exact
    * integer arithmetic (data_bytes·8000 DIV (rate·channels·bits)),
    * so the value replicates bit-for-bit in any engine with 64-bit
    * integer division. The quotient is computed as (a − a mod b) / b:
    * the numerator is then an exact multiple of b and both operands
    * are ≪ 2⁵³, so the IEEE division is exact for ALL header values —
    * true integer division, not double-division-then-floor (which is
    * only floor-exact while the quotient stays clear of a double
    * ulp). */
  def wavDurationMs(payload: Column): Column =
    when(isWav(payload),
      graft.ColumnOps.let(wavDataBytes(payload) * lit(8000L)) { a =>
        graft.ColumnOps.let(
          wavSampleRate(payload) * wavChannels(payload) * wavBitsPerSample(payload)) { b =>
          (a - pmod(a, b)) / b
        }
      })
      .otherwise(lit(null)).cast("long")

  /** Signed little-endian int16 at 1-based byte offset `off` (a
    * Column, so it rides inside HOF lambdas): uint16 then
    * two's-complement sign correction — exact integer ops only. */
  def s16le(payload: Column, off: Column): Column =
    graft.ColumnOps.let(u8(payload, off) + u8(payload, off + 1) * 256) { v =>
      when(v >= 32768, v - 65536).otherwise(v)
    }

  /** PCM sample decode of a canonical 16-bit WAV payload:
    * `array<int>` of all samples in storage order, NULL for non-WAV /
    * non-16-bit payloads (the drop-row malformed-input contract).
    * Native codegen'd one-pass byte walk
    * ([[graft.functions.WavPcm16Expr]]) — zero shuffle, scales with
    * rows; a real audio codec would slot in at a mapPartitions seam
    * exactly like the GVRL frame decoder, but PCM needs no library. */
  def wavPcm16(payload: Column): Column =
    call_function("graft_wav_pcm16", payload)

  /** HOF spec twin of [[wavPcm16]] (per-sample substr/hex/conv reads
    * inside an interpreted transform — bit-equality tested, ~100×
    * slower; don't use it in anything measured). */
  def wavPcm16Hof(payload: Column): Column = {
    val n = shiftright(wavDataBytes(payload), 1).cast("int")
    when(isWav(payload) && wavBitsPerSample(payload) === 16 && n > 0,
      transform(sequence(lit(0), n - 1), i => s16le(payload, lit(45) + i * 2)))
      .when(isWav(payload) && wavBitsPerSample(payload) === 16,
        array().cast("array<int>"))
      .otherwise(lit(null).cast("array<int>"))
  }

  /** Exact per-frame energies over a decoded PCM array
    * ([[wavPcm16]] output): non-overlapping `frameLen`-sample frames,
    * energy = Σ v² in BIGINT (65536²·frameLen ≪ 2⁶³ for any sane
    * frame), trailing partial frame dropped. NULL pcm propagates
    * (drop-row contract); fewer than `frameLen` samples → empty.
    * Native codegen'd one-pass loop
    * ([[graft.functions.PcmFrameEnergiesExpr]]) — no shuffle. */
  def pcmFrameEnergies(pcm: Column, frameLen: Int): Column = {
    require(frameLen >= 1, s"pcmFrameEnergies: frameLen must be ≥ 1, got $frameLen")
    call_function("graft_frame_energies", pcm, lit(frameLen))
  }

  /** HOF spec twin of [[pcmFrameEnergies]] (interpreted nested fold —
    * bit-equality tested; don't use it in anything measured). */
  def pcmFrameEnergiesHof(pcm: Column, frameLen: Int): Column = {
    require(frameLen >= 1, s"pcmFrameEnergiesHof: frameLen must be ≥ 1, got $frameLen")
    // let-bind the decoded array FIRST: callers pass composite
    // expressions (wavPcm16Hof), and HOF lambdas get no CSE — an
    // unbound pcm would re-decode the whole payload once per frame
    graft.ColumnOps.let(pcm) { p =>
      graft.ColumnOps.let(size(p)) { n =>
        when(p.isNull, lit(null).cast("array<long>"))
          .when(n < frameLen, array().cast("array<long>"))
          .otherwise(transform(sequence(lit(0), (n / frameLen).cast("int") - 1),
            f => aggregate(slice(p, f * frameLen + 1, lit(frameLen)), lit(0L),
              (a, v) => a + v.cast("long") * v.cast("long"))))
      }
    }
  }

  /** Canonical 44-byte PCM WAV header for synthetic payloads
    * (deterministic; tests + the verified query, NOT a real encoder). */
  def synthWavHeader(channels: Int, sampleRate: Int, bitsPerSample: Int,
                     dataBytes: Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataBytes) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(byteRate) ++ le16(blockAlign) ++ le16(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ le32(dataBytes)
  }

  /** Deterministic 8×8 grayscale raster for perceptual-hash tests and
    * the verified query (NOT a real decoder — the raster stands in
    * for a decoded thumbnail): pixel(i) = ((id%16)·31 + 7i) % 240 +
    * id%3. The id%3 term is a uniform brightness shift ≤ 2 — bounded
    * away from byte wrap-around (≤ 241) so aHash's strict mean
    * comparison is exactly invariant under it. */
  def synthGray8x8(id: Long): Array[Byte] = {
    val base = (id % 16) * 31
    val shift = id % 3
    Array.tabulate(64)(i => (((base + i * 7) % 240) + shift).toByte)
  }

  /** Deterministic channel-PLANAR RGB 8×8 raster (192 bytes: R plane,
    * G plane, B plane). Channel c's pixel i is
    * `((id%16)·31 + i·7 + c·11) % 240 + id%3` — the gray rule with a
    * per-channel phase, so channels genuinely differ and the
    * per-channel moments are distinguishable. */
  def synthRgb8x8(id: Long): Array[Byte] = {
    val base = (id % 16) * 31
    val shift = id % 3
    Array.tabulate(192) { j =>
      val c = j / 64; val i = j % 64
      (((base + i * 7 + c * 11) % 240) + shift).toByte
    }
  }

  /** Native sum of squared pixel values of an `n`-byte raster — the
    * second moment behind exact channel mean/variance stats. */
  def rasterSumSq(payload: Column, n: Int): Column =
    call_function("graft_raster_sumsq", payload, lit(n))

  /** HOF spec twin of [[rasterSumSq]] (interpreted per-byte parse —
    * bit-equality tested; don't use it in anything measured). */
  def rasterSumSqHof(payload: Column, n: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(n - 1)), i => u8(payload, i + lit(1)).cast("long")),
      lit(0L), (a, v) => a + v * v)

  /** One half of the 64-bit average hash (aHash) of an 8×8 grayscale
    * raster carried as a 64-byte binary column: bit i (pixel
    * `start+i`, i = 0..31) is set iff pixel·64 > Σ pixels — strict
    * integer comparison, no division, so both engines land the same
    * bit for any raster. MSB-first fold packs the 32 bits into a
    * non-negative long (two uint32 halves avoid BIGINT sign games a
    * full 64-bit pack would hit). A uniform brightness shift c adds
    * 64c to the sum and 64c to pixel·64 — bits are exactly invariant,
    * which is the "perceptual" in the hash. Pure narrow columnar —
    * zero shuffle, scales with rows.
    */
  def aHashHalf(payload: Column, start: Int): Column = {
    require(start == 0 || start == 32, s"start must be 0 or 32, got $start")
    call_function("graft_ahash_half", payload, lit(start))
  }

  /** HOF spec twin of [[aHashHalf]] (3× interpreted byte re-parses per
    * raster — bit-equality tested; don't use it in anything
    * measured). */
  def aHashHalfHof(payload: Column, start: Int): Column = {
    require(start == 0 || start == 32, s"start must be 0 or 32, got $start")
    graft.ColumnOps.let(transform(sequence(lit(0), lit(63)), i => u8(payload, i + 1).cast("long"))) { ps =>
      graft.ColumnOps.let(aggregate(ps, lit(0L), (a, v) => a + v)) { s =>
        aggregate(reverse(slice(ps, start + 1, 32)), lit(0L),
          (a, p) => a * 2 + when(p * 64 > s, 1L).otherwise(0L))
      }
    }
  }

  /** Integer box-filter 2× downsample of an 8×8 grayscale raster
    * held as a binary column — the image-pipeline resize stage: each
    * 2×2 block averages to one output pixel, out = ⌊Σblock/4⌋ via a
    * shift (exact integer floor mean, no float filter taps — so any
    * engine reproduces every pixel). Returns the 4×4 result as a
    * row-major array<long>. Pure narrow columnar — zero shuffle; at
    * corpus scale resize runs as a projection over the payload
    * column. Index math stays in int bit-ops (shiftright / mask):
    * Spark's `/` on ints promotes to double, which would silently
    * drift the offsets.
    */
  def boxDownsample8(payload: Column): Column =
    transform(sequence(lit(0), lit(15)), o => {
      val base = shiftright(o, 2) * 16 + o.bitwiseAND(lit(3)) * 2
      val s4 = u8(payload, base + 1) + u8(payload, base + 2) +
        u8(payload, base + 9) + u8(payload, base + 10)
      shiftright(s4.cast("long"), 2)
    })

  /** Sample every `stride`-th frame of an `array<binary>` column
    * (video keyframe thinning) — pure columnar.
    */
  def frameSample(frames: Column, stride: Int): Column =
    filter(transform(frames, (f, i) => struct(i.as("i"), f.as("f"))), s => s.getField("i") % stride === 0)
      .cast("array<struct<i:int,f:binary>>")

  /** Minimal PNG header (signature + IHDR prefix) for synthetic
    * payloads: enough for magic + dimension parsing. Deterministic —
    * used by tests and the verified query, NOT a real encoder.
    */
  def synthPngHeader(width: Int, height: Int): Array[Byte] = {
    def be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be(13) ++ "IHDR".getBytes("US-ASCII") ++ be(width) ++ be(height) ++
      Array[Byte](8, 6, 0, 0, 0)
  }

  /** Minimal JPEG: SOI + JFIF APP0 (padded by `pad` zero bytes) +
    * optional COM segment + SOF0 with the real dimensions + EOI. The
    * SOF0 offset varies with `pad`/`comment`, so parsers must
    * actually walk the segment list. Total length:
    * 41 + pad (+ 13 with comment). */
  def synthJpegHeader(width: Int, height: Int, pad: Int = 0, comment: Boolean = false): Array[Byte] = {
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val app0 = Array(0xFF, 0xE0).map(_.toByte) ++ be16(16 + pad) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(1) ++ be16(1) ++ Array[Byte](0, 0) ++ Array.fill(pad)(0.toByte)
    val com =
      if (comment) Array(0xFF, 0xFE).map(_.toByte) ++ be16(11) ++ "synthetic".getBytes("US-ASCII")
      else Array.empty[Byte]
    val sof0 = Array(0xFF, 0xC0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(height) ++ be16(width) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array(0xFF, 0xD8).map(_.toByte) ++ app0 ++ com ++ sof0 ++ Array(0xFF, 0xD9).map(_.toByte)
  }

  /** Minimal GIF89a: signature + logical screen descriptor (13 bytes,
    * little-endian dimensions). */
  def synthGifHeader(width: Int, height: Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    "GIF89a".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++ Array[Byte](0, 0, 0)
  }

  /** Batched per-partition decode — the mapPartitions seam a heavy
    * codec (libjpeg/ffmpeg) plugs into at scale. The decode here is
    * REAL: it parses the same three containers as the columnar
    * expressions (PNG IHDR, JPEG SOF segment walk, GIF logical
    * screen) in plain JVM code, and MultimodalSpec cross-checks the
    * two paths row-for-row. Input: (id, payload); output:
    * (id, fmt, width, height) with nulls for unparseable payloads.
    */
  def decodeBatched(spark: SparkSession, df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        def u8(i: Int): Int = bytes(i) & 0xff
        def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
        def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)).toLong
        val fmt =
          if (bytes.length >= 8 && u8(0) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
          else if (bytes.length >= 2 && u8(0) == 0xFF && u8(1) == 0xD8) "jpeg"
          else if (bytes.length >= 6 && new String(bytes.take(4), "US-ASCII") == "GIF8") "gif"
          else "unknown"
        val dims: Option[(Int, Int)] = fmt match {
          case "png" if bytes.length >= 24 => Some((be32(16).toInt, be32(20).toInt))
          case "jpeg" =>
            // walk marker segments until SOF0/SOF2 (mirrors jpegSofOffset)
            var off = 2; var found: Option[(Int, Int)] = None; var segs = 0
            while (found.isEmpty && segs < 8 && off + 3 < bytes.length && u8(off) == 0xFF) {
              val marker = u8(off + 1)
              if (marker == 0xC0 || marker == 0xC2) {
                if (off + 8 < bytes.length) found = Some((be16(off + 7), be16(off + 5)))
                segs = 8
              } else { off = off + 2 + be16(off + 2); segs += 1 }
            }
            found
          case "gif" if bytes.length >= 10 =>
            Some((u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8)))
          case _ => None
        }
        (id, fmt, dims.map(_._1), dims.map(_._2))
      })
      .toDF(idCol, "fmt", "width", "height")
  }

  // ---- raw-video frame sampling ------------------------------------

  /** GVID: the deterministic RAW-video stand-in container (real video
    * codecs aren't in this environment — decode is the documented stub
    * boundary; the Spark-side plumbing below is real). Layout:
    * "GVID" magic (4B) + u16le width + u16le height + u16le fps +
    * u32le frame_count (14-byte header), then frame_count fixed-size
    * grayscale frames of width×height bytes each — so frame offsets
    * are pure arithmetic, the shape columnar sampling needs. */
  def isGvid(payload: Column): Column =
    substring(payload, 1, 4).cast("string") === "GVID" && length(payload) >= 14
  def gvWidth(payload: Column): Column =
    when(isGvid(payload), leU16(payload, 5)).otherwise(lit(null).cast("int"))
  def gvHeight(payload: Column): Column =
    when(isGvid(payload), leU16(payload, 7)).otherwise(lit(null).cast("int"))
  def gvFps(payload: Column): Column =
    when(isGvid(payload), leU16(payload, 9)).otherwise(lit(null).cast("int"))
  def gvFrameCount(payload: Column): Column =
    when(isGvid(payload), leU32(payload, 11)).otherwise(lit(null).cast("long"))

  /** One-frame-per-second sampling over GVID containers — the video
    * pipeline's frame-extraction plumbing: per row, the sampled frame
    * indices (0, fps, 2·fps, …) explode columnar, each with its exact
    * integer timestamp, byte offset into the payload, and a probe of
    * the frame's first byte READ AT THAT OFFSET — proving the offsets
    * index real bytes, not just arithmetic. Narrow (zero shuffle):
    * output scales with frames sampled, not corpus. A real-codec
    * deployment swaps the probe for a mapPartitions decode of
    * `substr(payload, frame_off + 1, frame_size)`; schema and
    * partitioning stay as here.
    *
    * Output: (doc_id, frame_idx, ts_ms, frame_off, probe_byte) —
    * non-GVID rows are dropped (conservative, like the image/audio
    * parsers' null contract), and so are malformed headers (fps < 1
    * would step the sequence by 0 / divide by 0 and fail the whole
    * query instead of dropping the row; w·h < 1 would alias every
    * frame offset to the header).
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val p = col(payloadCol)
    df.filter(isGvid(p) && gvFps(p) >= 1 && gvWidth(p) >= 1 && gvHeight(p) >= 1)
      .select(col(idCol).as("doc_id"), p.as("_p"),
        gvWidth(p).as("_w"), gvHeight(p).as("_h"),
        gvFps(p).as("_fps"), gvFrameCount(p).as("_n"))
      .select(col("doc_id"), col("_p"), col("_w"), col("_h"), col("_fps"),
        explode(when(col("_n") > 0,
            sequence(lit(0), (col("_n") - 1).cast("int"), col("_fps")))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .select(col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        // exact integer division (idx·1000 DIV fps) — same contract as
        // wavDurationMs: subtract the remainder, then divide
        graft.ColumnOps.let(col("frame_idx").cast("long") * lit(1000L)) { a =>
          ((a - pmod(a, col("_fps"))) / col("_fps")).cast("long")
        }.as("ts_ms"),
        (lit(14L) + col("frame_idx").cast("long") * col("_w") * col("_h")).as("frame_off"),
        conv(hex(col("_p").substr(
          lit(15) + col("frame_idx") * col("_w") * col("_h"), lit(1))), 16, 10)
          .cast("long").as("probe_byte"))
  }

  /** Deterministic GVID container for tests and the verified query
    * (a stand-in, NOT a real encoder): frame i is filled with
    * `fill(i)` (0-255). */
  def synthVideo(width: Int, height: Int, fps: Int, frames: Int,
                 fill: Int => Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val header = "GVID".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
      le16(fps) ++ le32(frames)
    val body = (0 until frames).flatMap(i =>
      Array.fill(width * height)((fill(i) & 0xff).toByte)).toArray
    header ++ body
  }

  // ---- RLE-coded video: a REAL decode behind the codec seam --------

  /** GVRL: the GVID sibling whose frames are RLE-COMPRESSED, closing
    * the frame-decode seam with an actual (if trivial) codec instead
    * of a stub. Frame bodies are `(count u8, value u8)` run pairs;
    * because compressed frames are variable-size, the header carries a
    * per-frame byte index the way real containers index samples (MP4
    * `stco`/`stsz`): "GVRL" (4B) + u16le width + u16le height + u16le
    * fps + u32le frame_count, then frame_count × (u32le ABSOLUTE byte
    * offset, u32le compressed size), then the frame bodies. The index
    * keeps frame lookup columnar — sampling never scans the runs of
    * frames it skips. */
  def isGvrl(payload: Column): Column =
    substring(payload, 1, 4).cast("string") === "GVRL" && length(payload) >= 14
  def gvrlWidth(payload: Column): Column =
    when(isGvrl(payload), leU16(payload, 5)).otherwise(lit(null).cast("int"))
  def gvrlHeight(payload: Column): Column =
    when(isGvrl(payload), leU16(payload, 7)).otherwise(lit(null).cast("int"))
  def gvrlFps(payload: Column): Column =
    when(isGvrl(payload), leU16(payload, 9)).otherwise(lit(null).cast("int"))
  def gvrlFrameCount(payload: Column): Column =
    when(isGvrl(payload), leU32(payload, 11)).otherwise(lit(null).cast("long"))

  /** Little-endian uint32 at a DYNAMIC 1-based offset (the per-frame
    * index entries live at `15 + 8·frame_idx`). */
  private def leU32d(payload: Column, off: Column): Column =
    conv(concat(
      hex(payload.substr(off + 3, lit(1))), hex(payload.substr(off + 2, lit(1))),
      hex(payload.substr(off + 1, lit(1))), hex(payload.substr(off, lit(1)))), 16, 10)
      .cast("long")

  /** RLE encode a raster: `(count, value)` u8 pairs, runs capped at
    * 255. Tests / synthesis side of [[rleDecode]]. */
  def rleEncode(raster: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var i = 0
    while (i < raster.length) {
      var n = 1
      while (i + n < raster.length && raster(i + n) == raster(i) && n < 255) n += 1
      out += n.toByte += raster(i)
      i += n
    }
    out.toArray
  }

  /** RLE decode to EXACTLY `expect` bytes; null on any malformation
    * (odd pair, overflow past `expect`, shortfall) — the same
    * drop-row contract as every header parser here. */
  def rleDecode(bytes: Array[Byte], expect: Int): Array[Byte] = {
    if (bytes == null || expect < 0) return null
    // reject impossible claims BEFORE allocating: each 2-byte pair
    // yields at most 255 bytes, so a tiny corrupt header claiming a
    // multi-GB raster must return null, not attempt the allocation
    if (expect.toLong > (bytes.length / 2).toLong * 255) return null
    val out = new Array[Byte](expect)
    var i = 0
    var at = 0
    while (i + 1 < bytes.length) {
      val n = bytes(i) & 0xff
      val v = bytes(i + 1)
      if (n < 1 || at + n > expect) return null
      java.util.Arrays.fill(out, at, at + n, v)
      at += n
      i += 2
    }
    if (i != bytes.length || at != expect) null else out
  }

  /** One-frame-per-second sampling + REAL frame decode over GVRL:
    * header parse, sampled-index explode, index-table offset lookup,
    * and compressed-frame extraction are all COLUMNAR (codegen'd);
    * the RLE decompression itself runs at the declared codec seam —
    * ONE `mapPartitions` over the already-extracted compressed bytes,
    * exactly where a libav/libjpeg call would sit, so output scales
    * with frames SAMPLED, never with payload bytes shipped around.
    * Rows with a non-GVRL magic, a degenerate header (fps/w/h < 1) or
    * a malformed run stream drop; nothing throws on a corrupt cell.
    *
    * Output: (doc_id, frame_idx, ts_ms, raster) — raster is the
    * decoded width×height grayscale plane, ready for the columnar
    * raster operators ([[aHashHalf]], [[rasterSum]]). */
  def frameDecodeRle(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    frameDecodeRleStride(df, idCol, payloadCol, stride = None)

  /** [[frameDecodeRle]] with an explicit sampling stride: `None` =
    * the 1-frame-per-second default (stride = fps), `Some(1)` =
    * every frame (what consecutive-frame operators like
    * [[sceneCuts]] need), `Some(s)` = every s-th frame. Decode cost
    * scales with frames TOUCHED — the index table means skipped
    * frames are never read. */
  def frameDecodeRleStride(df: DataFrame, idCol: String, payloadCol: String,
                           stride: Option[Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    stride.foreach(s => require(s >= 1, s"frameDecodeRleStride: stride $s must be >= 1"))
    val p = col(payloadCol)
    val stepOf: Column => Column = fps => stride.map(s => lit(s).cast("int")).getOrElse(fps)
    val sampled = df
      // the index-table-fits check (`len ≥ 14 + 8n`) both validates
      // the container and BOUNDS frame_count by the actual payload
      // size — a corrupt u32 count (e.g. 2^31-1 in a 30-byte cell)
      // must drop the row, not drive sequence()/cast into a throw
      .filter(isGvrl(p) && gvrlFps(p) >= 1 && gvrlWidth(p) >= 1 && gvrlHeight(p) >= 1 &&
        length(p).cast("long") >= lit(14L) + gvrlFrameCount(p) * 8L)
      .select(col(idCol).as("doc_id"), p.as("_p"),
        gvrlWidth(p).as("_w"), gvrlHeight(p).as("_h"), gvrlFps(p).as("_fps"),
        explode(when(gvrlFrameCount(p) > 0,
            sequence(lit(0), (gvrlFrameCount(p) - 1).cast("int"), stepOf(gvrlFps(p))))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .select(col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        // exact integer ms (idx·1000 DIV fps), the wavDurationMs contract
        graft.ColumnOps.let(col("frame_idx").cast("long") * lit(1000L)) { a =>
          ((a - pmod(a, col("_fps"))) / col("_fps")).cast("long")
        }.as("ts_ms"),
        (col("_w") * col("_h")).as("_raster_len"),
        col("_p").substr(
          leU32d(col("_p"), lit(15) + col("frame_idx") * 8).cast("int") + 1,
          leU32d(col("_p"), lit(19) + col("frame_idx") * 8).cast("int")).as("_frame"))
    sampled.as[(Long, Long, Long, Int, Array[Byte])]
      .mapPartitions(_.flatMap { case (doc, idx, ts, rasterLen, frame) =>
        Option(rleDecode(frame, rasterLen)).map(r => (doc, idx, ts, r))
      })
      .toDF("doc_id", "frame_idx", "ts_ms", "raster")
  }

  /** Integer pixel sum of an `n`-byte raster column — columnar, the
    * aggregate [[aHashHalf]] thresholds against. */
  def rasterSum(payload: Column, n: Int): Column =
    call_function("graft_raster_sum", payload, lit(n))

  /** Sum of absolute pixel differences between two `n`-byte rasters
    * (native [[graft.functions.RasterSadExpr]]) — the
    * frame-difference metric behind [[sceneCuts]]. */
  def rasterSad(a: Column, b: Column, n: Int): Column =
    call_function("graft_raster_sad", a, b, lit(n))

  /** HOF spec twin of [[rasterSad]] (interpreted per-byte parse —
    * bit-equality tested; don't use it in anything measured). */
  def rasterSadHof(a: Column, b: Column, n: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(n)), i =>
        abs(conv(hex(a.substr(i, lit(1))), 16, 10).cast("long") -
            conv(hex(b.substr(i, lit(1))), 16, 10).cast("long"))),
      lit(0L),
      (acc, x) => acc + x)

  /** Scene-cut detection over the GVRL container: decode EVERY frame
    * (stride 1 — the per-frame index means only touched bytes are
    * read), lag each clip's raster stream by one, and flag frame
    * pairs whose SAD (sum of absolute pixel differences, native
    * [[rasterSad]]) exceeds `threshold` — the scene-boundary pass a
    * video training pipeline runs before scene-based frame sampling.
    * The lag window partitions by clip and a clip's frames are
    * bounded by its duration, so the window is clip-sized, never
    * corpus-sized; everything before it is narrow.
    *
    * Output: (doc_id, frame_idx, ts_ms, sad) — one row per CUT
    * (frame that starts a new scene), ordered upstream of the caller.
    */
  def sceneCuts(df: DataFrame, idCol: String, payloadCol: String,
                rasterLen: Int, threshold: Long): DataFrame = {
    val frames = frameDecodeRleStride(df, idCol, payloadCol, stride = Some(1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("_prev", lag(col("raster"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col("doc_id"), col("frame_idx"), col("ts_ms"),
        rasterSad(col("_prev"), col("raster"), rasterLen).as("sad"))
      .filter(col("sad") > threshold)
  }

  /** HOF spec twin of [[rasterSum]] (interpreted per-byte parse —
    * bit-equality tested; don't use it in anything measured). */
  def rasterSumHof(payload: Column, n: Int): Column =
    aggregate(transform(sequence(lit(0), lit(n - 1)), i => u8(payload, i + lit(1)).cast("long")),
      lit(0L), (a, v) => a + v)

  /** Deterministic GVRL container (tests + the verified query):
    * pixel p of frame f is `fill(f, p)` (0-255). */
  def synthVideoRle(width: Int, height: Int, fps: Int, frames: Int,
                    fill: (Int, Int) => Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val bodies = (0 until frames).map(f =>
      rleEncode(Array.tabulate(width * height)(pix => (fill(f, pix) & 0xff).toByte)))
    val headerLen = 14 + 8 * frames
    val offsets = bodies.scanLeft(headerLen)((acc, b) => acc + b.length)
    val index = (0 until frames).flatMap(f => le32(offsets(f)) ++ le32(bodies(f).length)).toArray
    "GVRL".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
      le16(fps) ++ le32(frames) ++ index ++ bodies.flatten.toArray
  }
}
