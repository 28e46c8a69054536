package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("magic detects png/jpeg/gif/unknown") {
    val rows = Seq(
      Multimodal.synthPngHeader(10, 20),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte),
      "GIF89a".getBytes("US-ASCII"),
      "nope".getBytes("US-ASCII")
    ).toDF("payload")
    val fmts = rows.select(Multimodal.magic(col("payload"))).as[String].collect().toSeq
    assert(fmts == Seq("png", "jpeg", "gif", "unknown"))
  }

  test("png dimensions parse back from the header") {
    val df = Seq((1L, Multimodal.synthPngHeader(640, 480))).toDF("id", "payload")
    val (w, h) = df.select(Multimodal.pngWidth(col("payload")), Multimodal.pngHeight(col("payload")))
      .as[(Long, Long)].head()
    assert(w == 640L && h == 480L)
    // non-png payload → null dims, not garbage
    val bad = Seq(("x", "notapng".getBytes("US-ASCII"))).toDF("id", "payload")
    assert(bad.select(Multimodal.pngWidth(col("payload"))).head().isNullAt(0))
  }

  test("jpeg SOF dims parse through variable-length segment walks") {
    // pad and comment move the SOF0 offset — every row walks a
    // different segment layout
    val rows = (0 until 14).map { i =>
      (i.toLong, Multimodal.synthJpegHeader(100 + i, 900 - i, pad = i % 7, comment = i % 2 == 0))
    }.toDF("id", "payload")
    val parsed = rows.select(col("id"),
        Multimodal.jpegWidth(col("payload")), Multimodal.jpegHeight(col("payload")))
      .as[(Long, Int, Int)].collect()
    parsed.foreach { case (i, w, h) => assert(w == 100 + i && h == 900 - i, s"row $i") }
    // truncated payload (SOI only) → null, not garbage
    val trunc = Seq((1L, Array(0xFF, 0xD8).map(_.toByte))).toDF("id", "payload")
    assert(trunc.select(Multimodal.jpegWidth(col("payload"))).head().isNullAt(0))
  }

  test("jpeg truncated INSIDE the SOF segment yields null and matches decodeBatched") {
    // cut the payload so the SOF marker is visible but its dimension
    // bytes are not: every prefix from SOI up to just-past-the-marker
    val full = Multimodal.synthJpegHeader(1234, 567, pad = 2, comment = true)
    val sof = full.indexOfSlice(Seq(0xFF.toByte, 0xC0.toByte))
    val rows = (2 to sof + 8).map(n => (n.toLong, full.take(n))).toDF("id", "payload")
    val columnar = rows.select(col("id"),
        Multimodal.jpegWidth(col("payload")), Multimodal.jpegHeight(col("payload")))
      .as[(Long, Option[Int], Option[Int])].collect().toSet
    // no truncation point may conv garbage: dims are null until the
    // full SOF dimension bytes are present
    columnar.foreach { case (n, w, h) =>
      assert(w.isEmpty && h.isEmpty, s"prefix $n parsed $w x $h from truncated SOF")
    }
    val batched = Multimodal.decodeBatched(spark, rows, "id", "payload")
      .select(col("id"), col("width"), col("height"))
      .as[(Long, Option[Int], Option[Int])].collect().toSet
    assert(batched == columnar)
  }

  test("gif logical-screen dims are little-endian") {
    val df = Seq((1L, Multimodal.synthGifHeader(641, 479))).toDF("id", "payload")
    val (w, h) = df.select(Multimodal.gifWidth(col("payload")), Multimodal.gifHeight(col("payload")))
      .as[(Int, Int)].head()
    assert(w == 641 && h == 479)
  }

  test("batched decode matches the columnar parsers row-for-row") {
    val rows = ((0 until 30).map { i =>
      val payload = (i % 3) match {
        case 0 => Multimodal.synthPngHeader(i + 1, 2 * i + 1)
        case 1 => Multimodal.synthJpegHeader(i + 1, 2 * i + 1, pad = i % 7, comment = i % 2 == 0)
        case _ => Multimodal.synthGifHeader(i + 1, 2 * i + 1)
      }
      (i.toLong, payload)
    } :+ (99L, "junk".getBytes("US-ASCII"))).toDF("id", "payload").repartition(3)
    val batched = Multimodal.decodeBatched(spark, rows, "id", "payload")
      .select("id", "fmt", "width", "height")
      .as[(Long, String, Option[Int], Option[Int])].collect().toSet
    val columnar = rows.select(col("id"), Multimodal.magic(col("payload")),
        Multimodal.imageWidth(col("payload")), Multimodal.imageHeight(col("payload")))
      .as[(Long, String, Option[Int], Option[Int])].collect().toSet
    assert(batched == columnar)
    assert(batched.exists { case (id, fmt, w, _) => id == 99L && fmt == "unknown" && w.isEmpty })
    assert(batched.count(_._2 == "jpeg") == 10)
  }

  test("WAV header parse roundtrips synth params; junk and truncation null out") {
    val good = (1 to 12).map { i =>
      val rate = Seq(8000, 16000, 22050, 44100)(i % 4)
      (i.toLong, Multimodal.synthWavHeader(i % 2 + 1, rate, if (i % 3 == 0) 8 else 16, i * 100))
    }
    val rows = (good :+
      (90L, "RIFFjunk".getBytes("US-ASCII")) :+                                    // bad magic tail
      (91L, Multimodal.synthWavHeader(2, 44100, 16, 400).take(30))                 // truncated
    ).toDF("id", "payload")
    val got = rows.select(col("id"),
        Multimodal.wavChannels(col("payload")),
        Multimodal.wavSampleRate(col("payload")),
        Multimodal.wavBitsPerSample(col("payload")),
        Multimodal.wavDataBytes(col("payload")),
        Multimodal.wavDurationMs(col("payload")))
      .as[(Long, Option[Int], Option[Long], Option[Int], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    good.foreach { case (id, _) =>
      val rate = Seq(8000, 16000, 22050, 44100)((id % 4).toInt)
      val (ch, bits, data) = ((id % 2 + 1).toInt, if (id % 3 == 0) 8 else 16, id * 100)
      val expectMs = data * 8000 / (rate.toLong * ch * bits)
      assert(got(id) == ((id, Some(ch), Some(rate.toLong), Some(bits), Some(data), Some(expectMs))), s"id=$id")
    }
    assert(got(90L)._2.isEmpty && got(91L)._2.isEmpty)
  }

  test("frameSample keeps every stride-th frame") {
    val frames = Seq(Seq("a", "b", "c", "d", "e").map(_.getBytes("US-ASCII"))).toDF("frames")
    val kept = frames.select(Multimodal.frameSample(col("frames"), 2).as("s"))
      .selectExpr("transform(s, x -> x.i) AS idx").as[Seq[Int]].head()
    assert(kept == Seq(0, 2, 4))
  }

  test("GVID frame sampling: synth→parse roundtrip, exact offsets/timestamps, junk dropped") {
    val rows = Seq(
      (1L, Multimodal.synthVideo(width = 3, height = 2, fps = 2, frames = 7, fill = i => 10 + i)),
      (2L, Multimodal.synthVideo(width = 1, height = 1, fps = 1, frames = 3, fill = i => 200 + i)),
      (3L, "not a video at all".getBytes("US-ASCII")),
      (4L, Array[Byte]('G', 'V', 'I', 'D', 1))) // truncated header
      .toDF("doc_id", "payload")
    val got = Multimodal.frameSample(rows, "doc_id", "payload")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc 1: frames 0,2,4,6 at fps=2 → ts 0,1000,2000,3000; frame size 6
    val exp1 = Seq(0L, 2L, 4L, 6L).map(i => (1L, i, i * 1000 / 2, 14 + i * 6, 10 + i))
    // doc 2: frames 0,1,2 at fps=1; frame size 1
    val exp2 = Seq(0L, 1L, 2L).map(i => (2L, i, i * 1000, 14 + i, 200 + i))
    assert(got == exp1 ++ exp2, got.toString)
  }

  test("frameSample drops malformed headers (fps=0, zero-area) instead of failing the query") {
    val rows = Seq(
      (1L, Multimodal.synthVideo(width = 2, height = 2, fps = 0, frames = 3, fill = i => i)),
      (2L, Multimodal.synthVideo(width = 0, height = 2, fps = 1, frames = 3, fill = i => i)),
      (3L, Multimodal.synthVideo(width = 1, height = 1, fps = 1, frames = 2, fill = i => 7 + i)))
      .toDF("doc_id", "payload")
    // fps=0 would step sequence() by 0 / divide by 0; w=0 aliases all
    // offsets — both must drop like non-GVID payloads, not throw
    val got = Multimodal.frameSample(rows, "doc_id", "payload")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((3L, 0L, 0L, 14L, 7L), (3L, 1L, 1000L, 15L, 8L)), got.toString)
  }

  test("GVRL RLE decode: compressed frames decode to exact rasters; malformed runs/index drop, not fail") {
    import org.apache.spark.sql.functions.col
    // codec roundtrip at the JVM level first: decode(encode) identity,
    // including a 255-capped run boundary and a non-uniform tail
    val flat = Array.fill(300)(42.toByte) ++ Array[Byte](1, 2, 2, 3)
    assert(Multimodal.rleDecode(Multimodal.rleEncode(flat), flat.length).toSeq == flat.toSeq)
    // malformed contracts: shortfall, overflow, odd pair, zero count,
    // and an impossible expect (a 2-byte stream can yield ≤255 bytes)
    // that must reject BEFORE allocating — a corrupt header claiming a
    // 2 GB raster may not OOM the executor
    assert(Multimodal.rleDecode(Array[Byte](3, 5), 4) == null)
    assert(Multimodal.rleDecode(Array[Byte](5, 5), 4) == null)
    assert(Multimodal.rleDecode(Array[Byte](4, 5, 9), 4) == null)
    assert(Multimodal.rleDecode(Array[Byte](0, 5), 0) == null)
    assert(Multimodal.rleDecode(Array[Byte](2, 7), Int.MaxValue) == null)

    // distributed seam: 2×2 frames, fps 1 — doc 3 carries a CORRUPT
    // run stream for frame 1 (index points at truncated pairs) and
    // doc 4 isn't GVRL at all; both must drop their rows silently
    def fill(id: Long)(f: Int, p: Int) = ((id * 31 + f * 7 + p * 5) % 251).toInt
    val good = Multimodal.synthVideoRle(2, 2, 1, 3, fill(1L))
    val corrupt = {
      val b = Multimodal.synthVideoRle(2, 2, 1, 3, fill(3L)).clone()
      // frame 1's index entry: shrink its size field to an odd byte
      // count so the run stream truncates mid-pair
      val sizeOff = 14 + 8 * 1 + 4
      b(sizeOff) = 1; b(sizeOff + 1) = 0; b(sizeOff + 2) = 0; b(sizeOff + 3) = 0
      b
    }
    // doc 5: frame_count bytes corrupted to 0xFFFFFFFF — the index
    // table can't fit the payload, so the whole row must drop at the
    // header gate (not drive sequence()/cast into a throw)
    val badCount = {
      val b = Multimodal.synthVideoRle(2, 2, 1, 3, fill(5L)).clone()
      b(10) = -1; b(11) = -1; b(12) = -1; b(13) = -1
      b
    }
    val rows = Seq((1L, good), (3L, corrupt), (4L, "not a video".getBytes("US-ASCII")),
      (5L, badCount))
      .toDF("doc_id", "payload")
    val got = Multimodal.frameDecodeRle(rows, "doc_id", "payload")
      .select(col("doc_id"), col("frame_idx"), col("ts_ms"), col("raster"))
      .as[(Long, Long, Long, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4.toSeq)).toMap
    // doc 1: all 3 frames decode to the exact fill rasters
    (0 until 3).foreach { f =>
      val want = Array.tabulate(4)(p => fill(1L)(f, p).toByte).toSeq
      assert(got((1L, f.toLong)) == ((f * 1000L, want)), s"frame $f: ${got.get((1L, f.toLong))}")
    }
    // doc 3: frames 0 and 2 survive, the corrupted frame 1 dropped;
    // doc 4 contributes nothing
    assert(got.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (3L, 0L), (3L, 2L)), got.keySet.toString)
  }

  test("wavPcm16: byte-exact sample decode incl. sign edges; malformed payloads null, empty data empty") {
    import org.apache.spark.sql.functions.col
    // sign-edge samples: both extremes, ±1 around the sign bit, zero
    val samples = Array(-32768, 32767, -1, 0, 1, 255, 256, -256)
    val data = samples.flatMap { v =>
      val u = v & 0xffff
      Array((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
    }
    val good = Multimodal.synthWavHeader(1, 16000, 16, data.length) ++ data
    val empty = Multimodal.synthWavHeader(1, 16000, 16, 0)
    val eightBit = Multimodal.synthWavHeader(1, 8000, 8, 4) ++ Array[Byte](1, 2, 3, 4)
    val junk = "not audio at all".getBytes("US-ASCII")
    val got = Seq((1L, good), (2L, empty), (3L, eightBit), (4L, junk))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.wavPcm16(col("payload")).as("pcm"))
      .as[(Long, Option[Seq[Int]])].collect().toMap
    assert(got(1L).contains(samples.toSeq), s"decoded ${got(1L)}")
    assert(got(2L).contains(Seq.empty), "zero-length data chunk decodes to an empty array")
    assert(got(3L).isEmpty, "8-bit payloads are out of decode scope → NULL, not garbage")
    assert(got(4L).isEmpty, "non-WAV bytes → NULL (drop-row contract)")
  }

  test("native wavPcm16/pcmFrameEnergies are bit-identical to their HOF twins on every payload shape") {
    // every contract edge in one battery: well-formed, zero-length
    // data chunk, 8-bit, non-WAV junk, header cut at each length
    // through the u32 size field (40..44 bytes — partial-byte size
    // parse), truncated mid-sample (declared > actual: odd and even
    // cut points → null-padded tail), empty payload
    val samples = Array(-32768, 32767, -1, 0, 1, 255, 256, -256, 1000, -1000, 63, -64)
    val data = samples.flatMap { v =>
      val u = v & 0xffff
      Array((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
    }
    val good = Multimodal.synthWavHeader(1, 16000, 16, data.length) ++ data
    val payloads: Seq[Array[Byte]] =
      Seq(
        good,
        Multimodal.synthWavHeader(1, 16000, 16, 0),
        Multimodal.synthWavHeader(1, 8000, 8, 4) ++ Array[Byte](1, 2, 3, 4),
        "not audio at all".getBytes("US-ASCII"),
        Array.empty[Byte]) ++
        (40 to 44).map(good.take) ++     // cuts inside/at the size field
        Seq(good.dropRight(1), good.dropRight(3), good.dropRight(4))
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "payload")
    val rows = df.select(col("id"),
        Multimodal.wavPcm16(col("payload")).as("nat"),
        Multimodal.wavPcm16Hof(col("payload")).as("hof"),
        Multimodal.pcmFrameEnergies(Multimodal.wavPcm16(col("payload")), 4).as("en_nat"),
        Multimodal.pcmFrameEnergiesHof(Multimodal.wavPcm16Hof(col("payload")), 4).as("en_hof"))
      .as[(Long, Option[Seq[Option[Int]]], Option[Seq[Option[Int]]],
           Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])].collect()
    rows.foreach { case (id, nat, hof, enNat, enHof) =>
      assert(nat == hof, s"payload $id: pcm native=$nat hof=$hof")
      assert(enNat == enHof, s"payload $id: energies native=$enNat hof=$enHof")
    }
    // the battery must actually exercise all three shapes
    val pcms = rows.map(_._2)
    assert(pcms.exists(_.exists(a => a.nonEmpty && a.forall(_.isDefined))), "no full decode")
    assert(pcms.exists(_.exists(a => a.exists(_.isEmpty))), "no null-padded tail case")
    assert(pcms.exists(_.isEmpty), "no dropped-row case")
  }

  test("pcmFrameEnergies: exact planted energies, partial tail dropped, null/short edge cases") {
    import org.apache.spark.sql.functions.col
    // 2 full 4-sample frames + a 3-sample tail that must be dropped
    val samples = Array(100, -100, 0, 3, /*frame 1*/ 1, 1, 1, 1, /*tail*/ 7, 7, 7)
    val data = samples.flatMap { v =>
      val u = v & 0xffff
      Array((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
    }
    val wav = Multimodal.synthWavHeader(1, 16000, 16, data.length) ++ data
    val short = Multimodal.synthWavHeader(1, 16000, 16, 4) ++ Array[Byte](1, 0, 2, 0)
    val junk = "junk".getBytes("US-ASCII")
    val got = Seq((1L, wav), (2L, short), (3L, junk)).toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.pcmFrameEnergies(
        Multimodal.wavPcm16(col("payload")), frameLen = 4).as("en"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(got(1L).contains(Seq(100L * 100 + 100 * 100 + 0 + 9, 4L)),
      s"exact fold incl. negative samples: ${got(1L)}")
    assert(got(2L).contains(Seq.empty), "fewer samples than one frame → empty, not error")
    assert(got(3L).isEmpty, "non-WAV → NULL rides through (drop-row contract)")
  }

  test("graft_pcm_stats matches the three separate HOF folds incl. null-sample semantics") {
    import org.apache.spark.sql.functions.{aggregate, greatest, abs, lit, call_function}
    // decoded arrays: normal, empty, with a null sample (truncated
    // payload tail), all-null
    val arrs: Seq[Option[Seq[Option[Int]]]] = Seq(
      Some(Seq(Some(3), Some(-7), Some(0), Some(32767), Some(-32768))),
      Some(Seq.empty),
      Some(Seq(Some(5), None, Some(-2))),
      Some(Seq(None, None)),
      None)
    val df = arrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "pcm")
    val rows = df.select(col("id"),
        call_function("graft_pcm_stats", col("pcm")).as("st"),
        size(col("pcm")).cast("long").as("n_hof"),
        aggregate(col("pcm"), lit(0L), (a, v) => greatest(a, abs(v).cast("long"))).as("peak_hof"),
        aggregate(col("pcm"), lit(0L), (a, v) => a + v.cast("long") * v.cast("long")).as("ss_hof"))
      .select(col("id"), col("st.n_samples"), col("st.peak"), col("st.sum_sq"),
        col("n_hof"), col("peak_hof"), col("ss_hof"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect()
    rows.foreach { case (id, n, p, ss, nH, pH, ssH) =>
      assert(n == nH && p == pH && ss == ssH, s"pcm $id: ($n,$p,$ss) vs ($nH,$pH,$ssH)")
    }
    assert(rows.exists(_._4.isEmpty), "null-sample sum_sq case present")
  }

  test("native aHashHalf/rasterSum are bit-identical to their HOF twins incl. truncated rasters") {
    // full rasters, a flat raster (all bits 0 — strict > never fires),
    // an extreme-contrast raster, truncations at 0/32/63 bytes, and a
    // longer-than-64 payload (extra bytes ignored)
    val full = Seq(1L, 2L, 17L).map(Multimodal.synthGray8x8)
    val flat = Array.fill[Byte](64)(100.toByte)
    val contrast = (Array.fill[Byte](32)(0.toByte) ++ Array.fill[Byte](32)(255.toByte))
    val long65 = Multimodal.synthGray8x8(3L) ++ Array[Byte](9)
    val payloads = full ++ Seq(flat, contrast, long65,
      Array.empty[Byte], Multimodal.synthGray8x8(4L).take(32), Multimodal.synthGray8x8(5L).take(63))
    val rows = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "payload")
      .select(col("id"),
        Multimodal.aHashHalf(col("payload"), 0).as("lo"),
        Multimodal.aHashHalfHof(col("payload"), 0).as("lo_hof"),
        Multimodal.aHashHalf(col("payload"), 32).as("hi"),
        Multimodal.aHashHalfHof(col("payload"), 32).as("hi_hof"),
        Multimodal.rasterSum(col("payload"), 64).as("s"),
        Multimodal.rasterSumHof(col("payload"), 64).as("s_hof"))
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])].collect()
    rows.foreach { case (id, lo, loH, hi, hiH, s, sH) =>
      assert(lo == loH && hi == hiH, s"raster $id: ($lo,$hi) vs ($loH,$hiH)")
      assert(s == sH, s"raster $id: sum $s vs $sH")
    }
    assert(rows.count(_._6.isEmpty) == 3, "three truncated rasters must sum to null")
    assert(rows.exists(r => r._2 != 0L || r._4 != 0L), "battery must include a nonzero hash")
  }

  test("rasterSumSq native equals the HOF twin incl. truncation; channel stats match brute moments") {
    import org.apache.spark.sql.functions._
    // twin battery: full, flat, extreme, truncated, overlong
    val payloads = Seq(Multimodal.synthGray8x8(1L), Array.fill[Byte](64)(100.toByte),
      Array.fill[Byte](32)(0.toByte) ++ Array.fill[Byte](32)(255.toByte),
      Multimodal.synthGray8x8(3L) ++ Array[Byte](9),
      Array.empty[Byte], Multimodal.synthGray8x8(5L).take(63))
    val rows = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "payload")
      .select(Multimodal.rasterSumSq(col("payload"), 64).as("q"),
        Multimodal.rasterSumSqHof(col("payload"), 64).as("q_hof"))
      .as[(Option[Long], Option[Long])].collect()
    rows.foreach { case (q, qh) => assert(q == qh, s"$q vs $qh") }
    assert(rows.count(_._1.isEmpty) == 2, "two truncated rasters must null")
    // brute per-channel moments over the sf corpus
    val ids = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id").as[Long].collect()
    val expect = (0 until 3).map { c =>
      val px = ids.flatMap(id => Multimodal.synthRgb8x8(id)
        .slice(c * 64, c * 64 + 64).map(b => (b & 0xff).toLong))
      val n = px.length.toLong; val s = px.sum
      val q = px.map(v => v * v).sum
      val mean = math.floor(s.toDouble / n * 1e4 + 0.5).toLong
      val vv = math.floor((BigInt(n) * q - BigInt(s) * s).toDouble / (n.toDouble * n.toDouble) * 1e4 + 0.5).toLong
      (c.toLong, n, s, q, mean, vv)
    }.toSet
    val got = graft.SparkEntry.queries("mm_channel_stats")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect, "channel moment stats")
    assert(got.map(_._5).size == 3, "channel means must differ (phase term)")
  }

  test("aHash: brightness-shift invariant, pattern-sensitive, JVM synth ↔ columnar parse agree") {
    import org.apache.spark.sql.functions.col
    // ids 1, 17, 33 share id%16=1 but differ in id%3 (1, 2, 0): same
    // pattern, three brightness levels. id 2 is a different pattern.
    val rows = Seq(1L, 17L, 33L, 2L)
      .map(id => (id, Multimodal.synthGray8x8(id))).toDF("doc_id", "payload")
    val got = rows.select(col("doc_id"),
        Multimodal.aHashHalf(col("payload"), 32).as("hi"),
        Multimodal.aHashHalf(col("payload"), 0).as("lo"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == got(17L) && got(17L) == got(33L),
      "uniform brightness shift must not move the average hash")
    assert(got(1L) != got(2L), "different rasters must hash apart")
    // independent JVM re-derivation of the bit rule from the raw bytes
    Seq(1L, 2L).foreach { id =>
      val ps = Multimodal.synthGray8x8(id).map(b => (b & 0xff).toLong)
      val s = ps.sum
      val hiRef = (0 until 32).foldLeft(0L)((a, j) => a * 2 + (if (ps(63 - j) * 64 > s) 1L else 0L))
      val loRef = (0 until 32).foldLeft(0L)((a, j) => a * 2 + (if (ps(31 - j) * 64 > s) 1L else 0L))
      assert(got(id) == ((hiRef, loRef)), s"id $id columnar vs JVM fold")
    }
    // halves are uint32 (MSB-first over 32 bits → never negative)
    got.values.foreach { case (hi, lo) =>
      assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32))
    }
  }

  test("native rasterSad matches the HOF twin; truncated payloads null") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array.tabulate(64)(i => i.toByte), Array.tabulate(64)(i => (i + 3).toByte)),
      (2L, Array.tabulate(64)(i => (255 - i).toByte), Array.fill(64)(0.toByte)),
      (3L, Array.fill(64)(200.toByte), Array.fill(64)(200.toByte)),
      (4L, Array.fill(10)(7.toByte), Array.fill(64)(9.toByte)) // truncated left
    ).toDF("id", "a", "b")
    val got = rows.select(col("id"),
        Multimodal.rasterSad(col("a"), col("b"), 64).as("nat"),
        Multimodal.rasterSadHof(col("a"), col("b"), 64).as("hof"))
      .as[(Long, Option[Long], Option[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (id, (nat, hof)) => assert(nat == hof, s"id $id: $nat vs $hof") }
    assert(got(1L)._1.contains(3L * 64), "uniform +3 shift sums to 192")
    assert(got(3L)._1.contains(0L), "identical rasters SAD 0")
    assert(got(4L)._1.isEmpty, "truncated raster -> null")
  }

  test("sceneCuts finds exactly the planted scene boundaries; jitter below threshold stays") {
    import spark.implicits._
    // 12 frames, scene change every 4: all pixels shift; within a
    // scene only pixel 0 jitters by <= 2
    val payload = Multimodal.synthVideoRle(width = 8, height = 8, fps = 2, frames = 12,
      fill = (f, pix) => (((f / 4) * 101 + pix * 5) % 241 + (if (pix == 0) f % 3 else 0)))
    val cuts = Multimodal.sceneCuts(
        Seq((7L, payload)).toDF("doc_id", "payload"), "doc_id", "payload",
        rasterLen = 64, threshold = 64L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(cuts.map(_._2).toSeq == Seq(4L, 8L), s"cuts at planted boundaries: ${cuts.toSeq}")
    // exact ts (idx*1000 div fps) and a genuinely large SAD at each cut
    cuts.foreach { case (_, idx, ts, sad) =>
      assert(ts == idx * 1000 / 2 && sad > 1000L, s"cut ($idx, $ts, $sad)") }
    // threshold above the jitter: a clip with NO scene change emits nothing
    val flat = Multimodal.synthVideoRle(width = 8, height = 8, fps = 1, frames = 6,
      fill = (f, pix) => (pix * 5) % 241 + (if (pix == 0) f % 3 else 0))
    val n = Multimodal.sceneCuts(Seq((8L, flat)).toDF("doc_id", "payload"),
      "doc_id", "payload", rasterLen = 64, threshold = 64L).count()
    assert(n == 0, "intra-scene jitter must stay below the threshold")
  }

  test("boxDownsample8 matches a reference byte loop on random rasters") {
    // property sweep: the columnar 2×2 floor-mean must agree with a
    // plain unsigned-byte loop, including >=0x80 bytes (sign traps)
    val rnd = new scala.util.Random(13)
    val payloads = (0 until 40).map { i =>
      val b = new Array[Byte](64); rnd.nextBytes(b); (i.toLong, b)
    }
    def ref(b: Array[Byte]): Seq[Long] =
      (0 until 16).map { o =>
        val r = (o / 4) * 2; val c = (o % 4) * 2
        val s = Seq(r * 8 + c, r * 8 + c + 1, (r + 1) * 8 + c, (r + 1) * 8 + c + 1)
          .map(j => b(j).toLong & 0xffL).sum
        s / 4
      }
    val got = payloads.toDF("id", "payload")
      .select(col("id"), Multimodal.boxDownsample8(col("payload")).as("px"))
      .as[(Long, Seq[Long])].collect().toMap
    payloads.foreach { case (id, b) =>
      assert(got(id) == ref(b), s"raster $id diverged from the reference loop")
    }
  }
}
