package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TagOps
import graft.osm.{OsmModel, OsmPbf}

/** Property-based hardening of the parsers and native geometry
  * expressions: scalacheck-generated adversarial inputs checked
  * against independent Scala reference implementations (not the
  * production code paths).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Gen.sample returns None when suchThat/mapOfN retries exhaust —
    * `.sample.get` would then throw NoSuchElementException
    * intermittently. Retry sampling until a value materializes. */
  private def sampled[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  // ---- hstore parser vs a reference regex parser ---------------------

  private val keyGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("a,b", "x=>y", """q\"uote""", "", "sp ace"))
  private val valGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("v,1", "k=>v", """say \"hi\"""", """back\\slash""", "", " lead"))
  private val pairGen = for { k <- keyGen; v <- valGen } yield (k, v)
  private val hstoreGen: Gen[String] = for {
    pairs <- Gen.listOfN(4, pairGen)
    sep <- Gen.oneOf(", ", ",", " , ", ",  ")
  } yield pairs.map { case (k, v) => s""""$k"=>"$v"""" }.mkString(sep)

  private def refHstore(s: String): Map[String, String] = {
    val rx = """"((?:[^"\\]|\\.)*)"\s*=>\s*"((?:[^"\\]|\\.)*)"""".r
    rx.findAllMatchIn(s).map { m =>
      def un(x: String) = x.replaceAll("""\\(.)""", "$1")
      un(m.group(1)) -> un(m.group(2))
    }.toMap
  }

  test("property: hstoreToMap matches the reference parser on generated adversarial input") {
    val inputs = sampled(Gen.listOfN(60, hstoreGen))
    val got = inputs.toDF("hs").select(TagOps.hstoreToMap(col("hs")).as("m"))
      .as[Map[String, String]].collect()
    inputs.zip(got).foreach { case (in, out) =>
      assert(out == refHstore(in), s"mismatch for <$in>")
    }
  }

  // ---- graft_line_dist2 vs brute-force segment math ------------------

  private def refSegDist2(p1: (Double, Double), p2: (Double, Double),
                          q1: (Double, Double), q2: (Double, Double)): Double = {
    def ps(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Double = {
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      val t0 = if (len2 == 0.0) 0.0 else ((px - ax) * dx + (py - ay) * dy) / len2
      val t = math.min(math.max(t0, 0.0), 1.0)
      val cx = ax + t * dx; val cy = ay + t * dy
      (cx - px) * (cx - px) + (cy - py) * (cy - py)
    }
    def cross(ox: Double, oy: Double, ax: Double, ay: Double, px: Double, py: Double) =
      (ax - ox) * (py - oy) - (ay - oy) * (px - ox)
    val o1 = cross(q1._1, q1._2, q2._1, q2._2, p1._1, p1._2)
    val o2 = cross(q1._1, q1._2, q2._1, q2._2, p2._1, p2._2)
    val o3 = cross(p1._1, p1._2, p2._1, p2._2, q1._1, q1._2)
    val o4 = cross(p1._1, p1._2, p2._1, p2._2, q2._1, q2._2)
    if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) && ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) 0.0
    else Seq(
      ps(p1._1, p1._2, q1._1, q1._2, q2._1, q2._2),
      ps(p2._1, p2._2, q1._1, q1._2, q2._1, q2._2),
      ps(q1._1, q1._2, p1._1, p1._2, p2._1, p2._2),
      ps(q2._1, q2._2, p1._1, p1._2, p2._1, p2._2)).min
  }

  test("property: graft_line_dist2 equals brute min over segment pairs on random polylines") {
    val coord = Gen.chooseNum(-50.0, 50.0)
    val lineGen = for {
      n <- Gen.chooseNum(2, 6)
      pts <- Gen.listOfN(n, Gen.zip(coord, coord))
    } yield pts
    val cases = sampled(Gen.listOfN(40, Gen.zip(lineGen, lineGen)))
    val df = cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .withColumn("la", expr("transform(a, p -> struct(p._1 AS x, p._2 AS y))"))
      .withColumn("lb", expr("transform(b, p -> struct(p._1 AS x, p._2 AS y))"))
      .select(col("i"), call_function("graft_line_dist2", col("la"), col("lb")).as("d2"))
    val got = df.as[(Int, Double)].collect().toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val exp = (for {
        sa <- a.sliding(2); sb <- b.sliding(2)
      } yield refSegDist2(sa(0), sa(1), sb(0), sb(1))).min
      assert(got(i) == exp, s"case $i: got ${got(i)}, expected $exp")
    }
  }

  // ---- pbf roundtrip on random elements ------------------------------

  test("property: pbf roundtrip preserves random nodes/ways/relations") {
    val id = Gen.chooseNum(-1000000L, 1000000L)
    val tagStr = Gen.alphaNumStr.map(_.take(10))
    val tags = Gen.mapOfN(2, Gen.zip(tagStr.suchThat(_.nonEmpty), tagStr))
    val nodeGen = for {
      i <- id; v <- Gen.chooseNum(1, 9); t <- tags
      la <- Gen.chooseNum(-89.9, 89.9); lo <- Gen.chooseNum(-179.9, 179.9)
    } yield OsmModel.Node(i, v, la, lo, t)
    val wayGen = for {
      i <- id; v <- Gen.chooseNum(1, 9); t <- tags
      nds <- Gen.listOfN(4, id)
    } yield OsmModel.Way(i, v, nds, t)
    // distinct ids so sort-and-compare is unambiguous
    val nodes = sampled(Gen.listOfN(30, nodeGen)).distinctBy(_.id)
    val ways = sampled(Gen.listOfN(15, wayGen)).distinctBy(_.id)
    val path = java.nio.file.Files.createTempFile("graft_prop", ".osm.pbf").toString
    OsmPbf.write(path, nodes, ways, Nil, blockSize = 7)
    val rn = OsmPbf.nodes(spark, path).collect().sortBy(_.id)
    val en = nodes.sortBy(_.id)
    assert(rn.map(n => (n.id, n.version, n.tags)).toSeq == en.map(n => (n.id, n.version, n.tags)))
    rn.zip(en).foreach { case (a, b) =>
      assert(math.abs(a.lat - b.lat) < 1e-7 && math.abs(a.lon - b.lon) < 1e-7) }
    assert(OsmPbf.ways(spark, path).collect().sortBy(_.id).toSeq == ways.sortBy(_.id))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }

  // ---- segment dedup / chunker round-trip identities ------------------

  test("property: segmentDedup with all-unique segments is the identity (modulo token normalization)") {
    // per-doc-unique words -> no segment can repeat across docs
    val docGen = Gen.chooseNum(3, 40)
    val docs = (1L to 25L).map { d =>
      val n = sampled(docGen)
      (d, (0 until n).map(i => s"D${d}w$i").mkString("  "))  // double spaces: tokenizer must normalize
    }
    val df = docs.toDF("doc_id", "text")
    val out = graft.dedup.Dedup.segmentDedup(df, "doc_id", "text", k = 5, threshold = 2)
      .select("doc", "clean_text", "n_dropped")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    out.zip(docs).foreach { case ((d, clean, dropped), (ed, text)) =>
      assert(d == ed && dropped == 0L)
      assert(clean == text.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("property: non-overlapping chunks concatenate back to the token stream; overlapping chunks cover it") {
    val docGen = for { n <- Gen.chooseNum(1, 90) } yield (0 until n).map(i => s"t$i").mkString(" ")
    val docs = (1L to 20L).map(d => (d, sampled(docGen)))
    val df = docs.toDF("doc_id", "text")
    // stride == window: exact partition of the token stream
    val exact = graft.text.Chunker.chunk(df, "doc_id", "text", window = 7, stride = 7)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect().groupBy(_._1)
    docs.foreach { case (d, text) =>
      val toks = text.split(" ").toSeq
      val rebuilt = exact(d).sortBy(_._2).flatMap(_._3.split(" ")).toSeq
      assert(rebuilt == toks, s"doc $d: non-overlapping chunks must partition the tokens")
    }
    // stride < window: every token covered, chunk starts advance by stride
    val lapped = graft.text.Chunker.chunk(df, "doc_id", "text", window = 7, stride = 4)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect().groupBy(_._1)
    docs.foreach { case (d, text) =>
      val toks = text.split(" ").toSet
      val covered = lapped(d).flatMap(_._3.split(" ")).toSet
      assert(covered == toks, s"doc $d: overlapping chunks must cover every token")
    }
  }

  // ---- graft_cdc_cuts vs a reference md5-window implementation -------

  test("property: native cdc cuts equal a reference md5-window scan on random unicode text") {
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.const(' ')),
      (1, Gen.oneOf('é', 'ß', '日', '本', '語', '\t')))
    val docGen = for {
      n <- Gen.chooseNum(0, 400)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val docs = (1L to 40L).map(d => (d, sampled(docGen)))
    def refBounds(text: String, window: Int, divisor: Int): Seq[Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      // reference works in CHARACTERS (codepoints here all BMP): hash
      // the UTF-8 bytes of the window substring ending at i
      val cuts = (window until text.length).filter { i =>
        val d = md.digest(text.substring(i - window, i).getBytes("UTF-8"))
        val probe = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        probe % divisor == 0
      }
      0 +: cuts :+ text.length
    }
    for ((w, dv) <- Seq((8, 16), (3, 4))) {
      val got = docs.toDF("doc_id", "text")
        .select(col("doc_id"), call_function("graft_cdc_cuts", col("text"), lit(w), lit(dv)).as("b"))
        .as[(Long, Seq[Int])].collect().toMap
      docs.foreach { case (d, text) =>
        assert(got(d) == refBounds(text, w, dv), s"doc $d window=$w divisor=$dv text=<$text>")
      }
    }
  }

  // ---- asofLookup vs asofBackward on random tables --------------------

  test("property: as-of lookup and sort-merge shapes agree on random keyed time series") {
    val leftGen = for {
      oid <- Gen.chooseNum(1L, 2000L); k <- Gen.chooseNum(1L, 8L); t <- Gen.chooseNum(0L, 100L)
    } yield (oid, k, t)
    val rightGen = for {
      k <- Gen.chooseNum(1L, 10L); rt <- Gen.chooseNum(0L, 100L); eid <- Gen.chooseNum(1L, 500L)
    } yield (k, rt, eid)
    val l = sampled(Gen.listOfN(120, leftGen)).distinctBy(_._1).toDF("oid", "k", "t")
    // duplicate (k, rt) rows included on purpose: ties resolve to the
    // struct-max payload in BOTH shapes
    val r = sampled(Gen.listOfN(150, rightGen)).toDF("k", "rt", "eid")
    for (strict <- Seq(false, true)) {
      val viaMerge = graft.operators.AsofJoin
        .asofBackward(l, "k", "t", r, "k", "rt", Seq("eid"), strict = strict)
        .select("oid", "asof_time", "asof_eid")
        .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
      val viaLookup = graft.operators.AsofJoin
        .asofLookup(l, "k", "t", r, "k", "rt", Seq("eid"), strict = strict)
        .select("oid", "asof_time", "asof_eid")
        .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
      assert(viaMerge == viaLookup, s"strict=$strict")
    }
  }

  test("property: epoch-partitioned as-of equals the global sort-merge across epoch widths") {
    val leftGen = for {
      oid <- Gen.chooseNum(1L, 4000L); k <- Gen.chooseNum(1L, 6L); t <- Gen.chooseNum(0L, 300L)
    } yield (oid, k, t)
    val rightGen = for {
      k <- Gen.chooseNum(1L, 8L); rt <- Gen.chooseNum(0L, 300L); eid <- Gen.chooseNum(1L, 900L)
    } yield (k, rt, eid)
    val l = sampled(Gen.listOfN(150, leftGen)).distinctBy(_._1).toDF("oid", "k", "t")
    val r = sampled(Gen.listOfN(200, rightGen)).toDF("k", "rt", "eid")
    for (strict <- Seq(false, true)) {
      val global = graft.operators.AsofJoin
        .asofBackward(l, "k", "t", r, "k", "rt", Seq("eid"), strict = strict)
        .select("oid", "asof_time", "asof_eid")
        .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
      // epoch = 1 (every timestamp its own group — all matches come
      // from carriers), mid widths, and one spanning the whole range
      // (degenerates to the global sort-merge)
      for (epochMs <- Seq(1L, 7L, 50L, 1000L)) {
        val epoch = graft.operators.AsofJoin
          .asofBackwardEpoch(l, "k", "t", r, "k", "rt", Seq("eid"), epochMs, strict = strict)
          .select("oid", "asof_time", "asof_eid")
          .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
        assert(epoch == global, s"strict=$strict epochMs=$epochMs")
      }
    }
  }

  // ---- topKPerQuery vs the bare window on random scored sets ---------

  test("property: salted two-stage top-k equals the bare per-query window on random inputs") {
    val rowGen = for {
      q <- Gen.chooseNum(1L, 6L)
      id <- Gen.chooseNum(1L, 500L)
      score <- Gen.chooseNum(-1000000L, 1000000L)
    } yield (q, id, score)
    // distinct (query, id): the operator contract (scored sets are
    // aggregated per pair before ranking)
    val rows = sampled(Gen.listOfN(3000, rowGen)).distinctBy(r => (r._1, r._2))
    val scored = rows.toDF("query_id", "id", "score")
    val order = Seq(col("score").desc, col("id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id").orderBy(order: _*)
    for (k <- Seq(1, 7, 40)) {
      val bare = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      for (fanout <- Seq(1, 3, 32)) {
        val got = graft.similarity.Similarity.topKPerQuery(scored, k, order, fanout)
          .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
        assert(got == bare, s"k=$k fanout=$fanout")
      }
    }
  }

  // ---- native expressions vs their HOF twins on random input ---------

  test("property: native wavPcm16 equals the HOF twin on random byte soup and random-cut WAVs") {
    import graft.multimodal.Multimodal
    val byteGen = Gen.chooseNum(0, 255).map(_.toByte)
    val soupGen = Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, byteGen)).map(_.toArray)
    val wavGen = for {
      n <- Gen.chooseNum(0, 40)
      samples <- Gen.listOfN(n, Gen.chooseNum(-32768, 32767))
      declared <- Gen.oneOf(n * 2, n * 2, n * 2, n * 2 + 2, math.max(0, n * 2 - 2)) // mostly honest
      cut <- Gen.chooseNum(0, 44 + n * 2)
      honest <- Gen.oneOf(true, true, true, false)
    } yield {
      val data = samples.flatMap { v =>
        val u = v & 0xffff
        Seq((u & 0xff).toByte, ((u >> 8) & 0xff).toByte)
      }.toArray
      val full = Multimodal.synthWavHeader(1, 16000, 16, declared) ++ data
      if (honest) full else full.take(cut)
    }
    val payloads = (1 to 120).map(_ => sampled(soupGen)) ++ (1 to 120).map(_ => sampled(wavGen))
    val rows = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "payload")
      .select(col("id"),
        Multimodal.wavPcm16(col("payload")).as("nat"),
        Multimodal.wavPcm16Hof(col("payload")).as("hof"))
      .as[(Long, Option[Seq[Option[Int]]], Option[Seq[Option[Int]]])].collect()
    rows.foreach { case (id, nat, hof) => assert(nat == hof, s"payload $id") }
  }

  test("property: native char/word n-grams and minhash equal their HOF twins on random unicode") {
    import graft.dedup.Dedup
    import graft.text.TextAnalysis
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('\t'),
      1 -> Gen.oneOf('é', 'ü', '中', '→', 'ß'), 1 -> Gen.const('\n'))
    val textGen = Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, charGen)).map(_.mkString)
    val texts = (1 to 200).map(_ => sampled(textGen))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(col("id"),
        TextAnalysis.charTrigrams(col("text")).as("ct"),
        TextAnalysis.charTrigramsHof(col("text")).as("ctH"),
        Dedup.shingles(col("text"), 3).as("sh"),
        Dedup.shinglesHof(col("text"), 3).as("shH"),
        Dedup.minhash(Dedup.shingles(col("text"), 3), 8).as("mh"),
        Dedup.minhashHof(Dedup.shinglesHof(col("text"), 3), 8).as("mhH"))
      .as[(Long, Seq[String], Seq[String], Seq[String], Seq[String],
           Seq[Option[Long]], Seq[Option[Long]])].collect()
    rows.foreach { case (id, ct, ctH, sh, shH, mh, mhH) =>
      assert(ct == ctH, s"trigrams $id")
      assert(sh == shH, s"shingles $id")
      assert(mh == mhH, s"minhash $id")
    }
  }

  test("property: native rasterSad equals a reference byte loop on random rasters incl. truncations") {
    import graft.multimodal.Multimodal
    def ref(a: Array[Byte], b: Array[Byte], n: Int): Option[Long] =
      if (a.length < n || b.length < n) None
      else Some((0 until n).map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff)).toLong).sum)
    val lenGen = Gen.frequency(6 -> Gen.const(64), 2 -> Gen.chooseNum(0, 63), 1 -> Gen.chooseNum(65, 80))
    val pairGen = for {
      la <- lenGen; lb <- lenGen
      a <- Gen.listOfN(la, Gen.chooseNum(-128, 127).map(_.toByte))
      b <- Gen.listOfN(lb, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (a.toArray, b.toArray)
    val pairs = (1 to 80).map(i => (i.toLong, sampled(pairGen)))
    val df = pairs.map { case (id, (a, b)) => (id, a, b) }.toDF("id", "a", "b")
    val got = df.select(org.apache.spark.sql.functions.col("id"),
        Multimodal.rasterSad(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"), 64).as("sad"))
      .as[(Long, Option[Long])].collect().toMap
    pairs.foreach { case (id, (a, b)) =>
      assert(got(id) == ref(a, b, 64), s"pair $id (|a|=${a.length}, |b|=${b.length})")
    }
  }

  test("property: native winnow equals a reference sliding-min scan on random token streams") {
    import graft.text.TextAnalysis
    // reference: brute-force O(ng·w) — per window take the min hash,
    // rightmost position on ties, then distinct positions in order
    def refWinnow(toks: Seq[String], n: Int, w: Int): Seq[(Int, Long)] = {
      val ng = toks.length - n + 1
      if (ng <= 0) return Seq.empty
      val hs = (0 until ng).map { i =>
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          toks.slice(i, i + n).mkString(" ").getBytes("UTF-8"))
        var acc = 0L; (0 until 8).foreach(b => acc = (acc << 8) | (d(b) & 0xffL)); acc >>> 4
      }
      val nw = math.max(ng - w + 1, 1)
      val picks = (0 until nw).map { i =>
        val win = (i until math.min(i + w, ng))
        val mn = win.map(hs).min
        val pos = win.filter(j => hs(j) == mn).max
        (pos + 1, mn)
      }
      picks.distinct
    }
    val tokGen = Gen.frequency(6 -> Gen.alphaNumStr.map(_.take(5)),
      1 -> Gen.const(""), 1 -> Gen.oneOf("ü", "中文", "a b"))
    val streamGen = for {
      len <- Gen.chooseNum(0, 40)
      toks <- Gen.listOfN(len, tokGen)
      n <- Gen.chooseNum(1, 4)
      w <- Gen.chooseNum(1, 6)
    } yield (toks, n, w)
    (1 to 60).foreach { _ =>
      val (toks, n, w) = sampled(streamGen)
      val got = Seq(Tuple1(toks)).toDF("toks")
        .select(TextAnalysis.winnow(col("toks"), n, w).as("v"))
        .as[Seq[(Int, Long)]].head()
      assert(got == refWinnow(toks, n, w), s"toks=$toks n=$n w=$w")
    }
  }
  test("property: MULTI* WKB roundtrips through graft_geom_parts for random geometry sets, byte orders, srid") {
    import graft.functions.WkbGeomExpr
    val coord = Gen.chooseNum(-180000000L, 180000000L).map(_ / 1e6)
    def ringGen(minPts: Int) = for {
      n <- Gen.chooseNum(minPts, 8)
      pts <- Gen.listOfN(n, Gen.zip(coord, coord))
    } yield pts.toArray
    val polyPart = for {
      nRings <- Gen.chooseNum(1, 3)
      rings <- Gen.listOfN(nRings, ringGen(3))
    } yield rings.toArray
    val linePart = ringGen(2).map(Array(_))
    val pointPart = ringGen(1).map(r => Array(r.take(1)))
    val geomGen = for {
      baseType <- Gen.oneOf(4, 5, 6)
      partGen = baseType match {
        case 4 => pointPart; case 5 => linePart; case 6 => polyPart
      }
      nParts <- Gen.chooseNum(1, 4)
      parts <- Gen.listOfN(nParts, partGen)
      srid <- Gen.oneOf(-1, 4326, 3857)
      be <- Gen.oneOf(true, false)
      hex <- Gen.oneOf(true, false)
    } yield (baseType, parts.toArray, srid, be, hex)
    (1 to 60).foreach { _ =>
      val (bt, parts, srid, be, hex) = sampled(geomGen)
      val bytes = WkbGeomExpr.encodeMulti(bt, parts, srid, be)
      val expect = parts.zipWithIndex.flatMap { case (p, pi) =>
        p.zipWithIndex.flatMap { case (r, ri) => r.map { case (x, y) => (pi, ri, x, y) } } }.toSeq
      val got =
        if (hex) {
          val h = bytes.map("%02x".format(_)).mkString
          Seq(Tuple1(h)).toDF("g")
            .select(call_function("graft_geom_parts", col("g")).as("p"))
            .as[Seq[(Int, Int, Double, Double)]].head()
        } else
          Seq(Tuple1(bytes)).toDF("g")
            .select(call_function("graft_geom_parts", col("g")).as("p"))
            .as[Seq[(Int, Int, Double, Double)]].head()
      assert(got == expect, s"bt=$bt srid=$srid be=$be hex=$hex")
      // truncation anywhere inside the payload must yield NULL, not junk
      val cut = bytes.take(bytes.length - 1 - sampled(Gen.chooseNum(0, 15)).min(bytes.length - 6))
      val gotCut = Seq(Tuple1(cut)).toDF("g")
        .select(call_function("graft_geom_parts", col("g")).isNull.as("n"))
        .as[Boolean].head()
      assert(gotCut, s"truncated buffer must decode NULL (bt=$bt len=${cut.length}/${bytes.length})")
    }
  }
}
