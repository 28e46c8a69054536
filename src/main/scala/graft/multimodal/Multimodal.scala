package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with
  * typed metadata — the training-data-pipeline pattern: payloads stay
  * as `binary` columns, light header fields are extracted columnar
  * (codegen'd — no UDF), and heavy decode runs batched per partition
  * behind a stub (the real codec is environment-specific).
  *
  * Header parsing is REAL (PNG IHDR / JPEG & GIF magic): hex() +
  * conv() on binary slices, so it distributes and survives pushdown.
  */
object Multimodal {

  /** Big-endian uint32 at 1-based byte offset `off` of a binary col. */
  def beU32(payload: Column, off: Int): Column =
    conv(hex(substring(payload, off, 4)), 16, 10).cast("long")

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

  /** STUB decode: a real pipeline would hand batches to a codec
    * (libjpeg/ffmpeg) here — per-partition batching is the real
    * plumbing; the "decoded features" are a deterministic fake.
    * Input: (id, payload); output: (id, fmt_ok, header_checksum).
    */
  def decodeStub(spark: SparkSession, df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val ok = bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'
          val checksum = bytes.take(29).foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 2147483647L)
          (id, ok, checksum)
        }
      }
      .toDF(idCol, "fmt_ok", "header_checksum")
  }
}
