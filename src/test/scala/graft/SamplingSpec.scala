package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sample.Sampling
import graft.text.Chunker
import graft.dedup.Dedup

/** Sampling / packing / chunking / segment-dedup operator specs:
  * value-level contracts against in-memory reference folds (the
  * corpus-level DuckDB gate is tools/check.py).
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stratifiedSample is deterministic, respects strata rates, carries 1/rate weights") {
    val df = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5)
    val out = Sampling.stratifiedSample(df, "doc_id", "source", rates, defaultRate = 0.25)
    val again = Sampling.stratifiedSample(df, "doc_id", "source", rates, defaultRate = 0.25)
    val rows = out.select("doc_id", "source", "weight_fp4").as[(Long, String, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == again.select("doc_id", "source", "weight_fp4")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq, "hash sampling must be rerun-stable")
    val bySrc = rows.groupBy(_._2).map { case (s, r) => s -> r.length }
    assert(bySrc("src0") == 500, "rate 1.0 keeps everything")
    // 500 candidates per stratum; md5-uniform keep counts concentrate
    // tightly around rate*500 (±5 sigma ≈ ±55)
    assert(math.abs(bySrc("src1") - 250) < 60, s"src1 kept ${bySrc("src1")} of 500 at rate 0.5")
    assert(math.abs(bySrc("src2") - 125) < 55, s"src2 kept ${bySrc("src2")} of 500 at rate 0.25")
    assert(rows.collect { case (_, "src0", w) => w }.forall(_ == 10000L))
    assert(rows.collect { case (_, "src1", w) => w }.forall(_ == 20000L))
    assert(rows.collect { case (_, "src2", w) => w }.forall(_ == 40000L))
  }

  test("prioritySample: exact k, weight-biased, scale-invariant, partitioning-stable") {
    // 60 heavy docs (w=5000) among 940 light ones (w=5): priority
    // sampling at k=100 must keep essentially every heavy doc
    val df = (0L until 1000L).map(i => (i, if (i < 60) 5000L else 5L))
      .toDF("doc_id", "w")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.prioritySample(d, "doc_id", "w", k = 100)
        .select("doc_id").as[Long].collect().toSet
    val out = ids(df)
    assert(out.size == 100, "sample size is pinned at exactly k")
    val heavy = out.count(_ < 60)
    assert(heavy >= 55, s"weight bias: only $heavy of 60 heavy docs kept")
    // scale invariance: priorities rescale together, selection is a
    // function of relative weights only
    assert(ids(df.withColumn("w", col("w") * 1000L)) == out)
    // pure function of the data, not the partitioning
    assert(ids(df.repartition(13)) == out)
    // k ≥ n degenerates to the full frame
    assert(ids(df.limit(40)) == (0L until 40L).toSet)
  }

  test("reservoirPerStratum yields exactly k rows per stratum, stable under repartitioning") {
    val df = (0L until 900L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val out = Sampling.reservoirPerStratum(df, "doc_id", "source", k = 7)
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(out.groupBy(_._2).view.mapValues(_.length).toMap == Map("s0" -> 7, "s1" -> 7, "s2" -> 7))
    // identical choice regardless of physical layout
    val re = Sampling.reservoirPerStratum(df.repartition(13), "doc_id", "source", k = 7)
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(out.toSet == re.toSet, "the sample is a pure function of ids, not of partitioning")
    // small stratum: all rows kept, ranks contiguous
    val tiny = Sampling.reservoirPerStratum(
        Seq((1L, "only"), (2L, "only")).toDF("doc_id", "source"), "doc_id", "source", k = 7)
      .select("rank_in_stratum").as[Long].collect().sorted.toSeq
    assert(tiny == Seq(1L, 2L))
  }

  test("packNextFit matches a sequential next-fit fold; no bin exceeds budget except singletons") {
    val budget = 100L
    // weights include an over-budget doc (id 7 -> 150 tokens)
    val docs = (0L until 200L).map(i => (i, if (i == 7L) 150L else 10L + i % 40L))
    val out = Sampling.packNextFit(spark, docs.toDF("doc_id", "n_toks"), "doc_id", "n_toks",
      budget, numGroups = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // reference: same next-fit fold per group in plain Scala
    val expected = docs.groupBy(_._1 % 4).flatMap { case (g, ds) =>
      var bin = -1L; var fill = budget + 1
      ds.sortBy(_._1).map { case (id, w) =>
        if (fill + w <= budget) fill += w else { bin += 1; fill = w }
        (id, g, bin, w)
      }
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected)
    // bins within budget unless a single doc overflows alone
    out.groupBy(r => (r._2, r._3)).foreach { case ((g, b), rs) =>
      val tot = rs.map(_._4).sum
      assert(tot <= budget || rs.length == 1, s"group $g bin $b holds $tot tokens in ${rs.length} docs")
    }
    // bin ids contiguous from 0 per group
    out.groupBy(_._2).foreach { case (g, rs) =>
      val bins = rs.map(_._3).distinct.sorted.toSeq
      assert(bins == (0L until bins.length).toSeq, s"group $g bins not contiguous: $bins")
    }
  }

  test("chunk covers every token with the declared overlap and keeps the short tail") {
    val df = Seq((1L, (1 to 30).map(i => s"t$i").mkString(" ")), (2L, "a b")).toDF("doc_id", "text")
    val rows = Chunker.chunk(df, "doc_id", "text", window = 16, stride = 12)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val doc1 = rows.filter(_._1 == 1L)
    assert(doc1.map(_._2).toSeq == Seq(0L, 1L, 2L), "30 tokens, stride 12 -> starts 0,12,24")
    assert(doc1.map(_._3).toSeq == Seq(16L, 16L, 6L))
    assert(doc1(1)._4.split(" ").head == "t13", "chunk 1 starts at token 13")
    assert(doc1(0)._4.split(" ").takeRight(4).toSeq == doc1(1)._4.split(" ").take(4).toSeq,
      "window 16 / stride 12 -> 4-token overlap between consecutive chunks")
    // every token appears in some chunk
    val covered = doc1.flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 30).map(i => s"t$i").toSet)
    assert(rows.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)).toSeq == Seq((0L, 2L, "a b")),
      "short doc -> one short chunk")
  }

  test("segmentDedup strips segments shared across docs and reassembles survivors in order") {
    val boiler = "terms of service apply"  // k=4 -> one full boilerplate segment
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", k = 4, threshold = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "alpha beta gamma delta", 1L, 1L)))
    assert(out(1) == ((2L, "epsilon zeta eta theta", 1L, 1L)))
    assert(out(2) == ((3L, "iota kappa lambda mu nu xi omicron pi", 2L, 0L)))
  }

  test("segmentDedup keeps order across many segments and counts kept+dropped = total") {
    val common = "shared boiler"
    val docs = (1L to 6L).map { d =>
      // alternating unique / shared 2-token segments
      val segs = (0 until 8).map(i => if (i % 2 == 1) common else s"u${d}x$i y$i")
      (d, segs.mkString(" "))
    }.toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", k = 2, threshold = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (d, txt, kept, dropped) =>
      assert(kept + dropped == 8L)
      assert(dropped == 4L, s"doc $d should drop its 4 shared segments")
      assert(txt == (0 until 8).collect { case i if i % 2 == 0 => s"u${d}x$i y$i" }.mkString(" "),
        "survivors keep original order")
    }
  }

  test("cdcChunk boundaries re-synchronize after a prefix insert (fixed chunking never re-aligns)") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "PREFIX-INSERTED-CONTENT " + base)).toDF("doc_id", "text")
    val out = Chunker.cdcChunk(docs, "doc_id", "text", window = 8, divisor = 16)
      .select("doc_id", "chunk_hash").as[(Long, String)].collect()
    val h1 = out.filter(_._1 == 1L).map(_._2).toSet
    val h2 = out.filter(_._1 == 2L).map(_._2).toSet
    assert(h1.size > 3, s"expected several chunks, got ${h1.size}")
    // all but the first (perturbed) chunk of doc 1 must reappear in
    // doc 2 verbatim — the content-defined property
    val shared = h1.intersect(h2)
    assert(shared.size >= h1.size - 1, s"only ${shared.size}/${h1.size} chunks re-aligned")
    // chunks cover the text exactly: lengths sum to doc length
    val lens = Chunker.cdcChunk(docs, "doc_id", "text", window = 8, divisor = 16)
      .groupBy("doc_id").agg(sum("n_chars_chunk").as("s")).as[(Long, Long)].collect().toMap
    assert(lens(1L) == base.length && lens(2L) == base.length + 24)
    // empty text chunks to nothing
    assert(Chunker.cdcChunk(Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text").isEmpty)
  }

  test("native cdc cut finder is bit-identical to the HOF twin (incl. multi-byte chars)") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, "PREFIX " + base),
      (3L, "héllo wörld " * 30 + "日本語テキスト " * 10), // multi-byte: char ≠ byte offsets
      (4L, "short"),                                      // below the window → one chunk
      (5L, "")                                            // empty → no rows
    ).toDF("doc_id", "text")
    for ((w, d) <- Seq((8, 16), (4, 8), (12, 32))) {
      val native = Chunker.cdcChunk(docs, "doc_id", "text", window = w, divisor = d)
        .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      val hof = Chunker.cdcChunkHof(docs, "doc_id", "text", window = w, divisor = d)
        .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(native == hof, s"window=$w divisor=$d")
    }
    // null text behaves like the HOF form: no rows
    val withNull = Seq((1L, Option("alpha beta gamma delta epsilon")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(Chunker.cdcChunk(withNull, "doc_id", "text").select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("split is a disjoint exhaustive partition with sane masses, stable across repartition") {
    val df = (0L until 4000L).map(Tuple1(_)).toDF("doc_id")
    val fr = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val out = Sampling.split(df, "doc_id", fr)
      .select("doc_id", "split").as[(Long, String)].collect()
    // exhaustive + disjoint: every row exactly once, only known names
    assert(out.length == 4000 && out.map(_._1).distinct.length == 4000)
    val byName = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    // masses within a loose band (md5-uniform, n=4000)
    assert(math.abs(byName("train") / 4000.0 - 0.75) < 0.05, byName.toString)
    assert(math.abs(byName("val") / 4000.0 - 0.125) < 0.05, byName.toString)
    // pure function of (salt, id): any repartitioning assigns identically
    val re = Sampling.split(df.repartition(13), "doc_id", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.forall { case (id, s) => re(id) == s })
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.split(df, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("kfold partitions into k balanced folds, stable across repartition, matches the md5 rule") {
    val df = (0L until 4000L).map(Tuple1(_)).toDF("doc_id")
    val out = Sampling.kfold(df, "doc_id", k = 5)
      .select("doc_id", "fold").as[(Long, Long)].collect()
    assert(out.length == 4000 && out.map(_._1).distinct.length == 4000)
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L, 4L), sizes.toString)
    sizes.values.foreach(n => assert(math.abs(n / 4000.0 - 0.2) < 0.05, sizes.toString))
    // pure function of (salt, id)
    val re = Sampling.kfold(df.repartition(13), "doc_id", k = 5)
      .select("doc_id", "fold").as[(Long, Long)].collect().toMap
    assert(out.forall { case (id, f) => re(id) == f })
    // independent JVM re-derivation of the rule
    val md = java.security.MessageDigest.getInstance("MD5")
    out.take(200).foreach { case (id, f) =>
      val hex = md.digest(s"kf:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      assert(f == math.min(math.floor(u * 5).toLong, 4L), s"id $id")
    }
    intercept[IllegalArgumentException] { Sampling.kfold(df, "doc_id", k = 1) }
  }

  test("budgetSelect keeps the greedy score-ordered prefix, independent of partitioning") {
    val rows = (1L to 500L).map(i => (i, (i * 37 % 211) + 1, (i * 13 % 50) + 1)) // (id, score, weight)
    val df = rows.toDF("doc_id", "score", "wt")
    val budget = 3000L
    // scala reference: strict (score desc, id) walk
    val expect = rows.sortBy { case (id, sc, _) => (-sc, id) }
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, sc, w)) => (id, sc, w, cum + w) }
      .tail.takeWhile(_._4 <= budget)
      .map { case (id, _, _, cum) => id -> cum }.toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = Sampling.budgetSelect(df.repartition(parts), "doc_id", "score", "wt", budget)
        .select("doc_id", "cum_weight").as[(Long, Long)].collect().toMap
      assert(got == expect, s"parts=$parts: got ${got.size}, expect ${expect.size}")
    }
    assert(Sampling.budgetSelect(df, "doc_id", "score", "wt", 0L).isEmpty)
  }

  test("temperatureSample flattens the source distribution toward sqrt mass, deterministic") {
    // skewed corpus: big source 900 rows, small source 100 rows
    val df = ((1L to 900L).map(i => (i, "big")) ++ (1001L to 1100L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureSample(df, "doc_id", "source", targetTotal = 200L)
      .as[(Long, String, Long)].collect()
    val rates = out.groupBy(_._2).view.mapValues(_.head._3).toMap
    // sqrt mass: p_big = 30/40, p_small = 10/40 → keep-rates
    // r_big = 200·0.75/900 ≈ 0.1667, r_small = 200·0.25/100 = 0.5 —
    // the small source keeps 3× the rate of the big one
    assert(rates("small") > rates("big") * 2, rates.toString)
    assert(rates.values.forall(r => r > 0 && r <= 1000000))
    // deterministic under repartitioning
    val out13 = Sampling.temperatureSample(df.repartition(13), "doc_id", "source", 200L)
      .as[(Long, String, Long)].collect()
    assert(out13.toSet == out.toSet)
    // tiny target on a tiny source caps at rate 1e6 (keep everything)
    val capped = Sampling.temperatureSample(df, "doc_id", "source", targetTotal = 100000L)
      .as[(Long, String, Long)].collect()
    assert(capped.length == 1000 && capped.forall(_._3 == 1000000L))
  }

  test("temperatureSample: null strata drop, non-string strata cast — no driver crash") {
    // null stratum rows must be excluded from rates AND output (not
    // silently routed to the fold's default rate), and an INT strata
    // column must work via the string cast instead of a driver CCE
    val withNulls = ((1L to 90L).map(i => (i, Option("a"))) ++
      (101L to 110L).map(i => (i, Option.empty[String]))).toDF("doc_id", "source")
    val out = Sampling.temperatureSample(withNulls, "doc_id", "source", targetTotal = 50L)
      .as[(Long, Option[String], Long)].collect()
    assert(out.nonEmpty && out.forall(_._2.contains("a")), out.mkString(","))
    val intStrata = (1L to 100L).map(i => (i, (i % 2).toInt)).toDF("doc_id", "source")
    val outInt = Sampling.temperatureSample(intStrata, "doc_id", "source", targetTotal = 40L)
      .as[(Long, Int, Long)].collect()
    assert(outInt.nonEmpty && outInt.map(_._2).distinct.sorted.sameElements(Array(0, 1)))
  }

  test("mixBudgetSelect: per-stratum greedy prefixes, unknown strata dropped, partition-stable") {
    val rows = (1L to 600L).map(i =>
      (i, s"s${i % 4}", (i * 37 % 211) + 1, (i * 13 % 50) + 1)) // (id, src, score, weight)
    val df = rows.toDF("doc_id", "source", "score", "wt")
    val budgets = Map("s0" -> 2000L, "s1" -> 1000L, "s2" -> 500L) // s3 absent → dropped
    // scala reference: per-stratum strict (score desc, id) walks
    val expect = rows.filter(r => budgets.contains(r._2)).groupBy(_._2).flatMap { case (s, rs) =>
      rs.sortBy { case (id, _, sc, _) => (-sc, id) }
        .scanLeft((0L, 0L)) { case ((_, cum), (id, _, _, w)) => (id, cum + w) }
        .tail.takeWhile(_._2 <= budgets(s)).map { case (id, cum) => id -> cum }
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = Sampling.mixBudgetSelect(df.repartition(parts),
          "doc_id", "score", "wt", "source", budgets)
        .select("doc_id", "cum_weight").as[(Long, Long)].collect().toMap
      assert(got == expect, s"parts=$parts: got ${got.size}, expect ${expect.size}")
      assert(!got.keySet.exists(id => id % 4 == 3), "unknown stratum leaked")
    }
  }

  test("deterministicShuffle is partitioning-stable, shards are dense, positions contiguous") {
    val df = (0L until 500L).map(i => Tuple1(i)).toDF("doc_id")
    val a = Sampling.deterministicShuffle(df, "doc_id", numShards = 8)
      .as[(Long, Long, Long)].collect().toSet
    // same rows under a different physical partitioning → same output
    val b = Sampling.deterministicShuffle(df.repartition(13), "doc_id", numShards = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.size == 500)
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // every shard's positions are exactly 1..size (a rank, not a hash)
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq, s"shard $s")
    }
    // different salt → different permutation (it's an epoch lever)
    val c = Sampling.deterministicShuffle(df, "doc_id", numShards = 8, salt = "epoch1")
      .as[(Long, Long, Long)].collect().toSet
    assert(c != a)
  }

  test("budgetSelect rejects non-integral weight columns up front") {
    val df = Seq((1L, 10L, 1.5), (2L, 5L, 2.5)).toDF("doc_id", "score", "wt")
    val e = intercept[IllegalArgumentException] {
      Sampling.budgetSelect(df, "doc_id", "score", "wt", 10L)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // null weights in an all-null partition no longer NPE the offset
    // collect — they coalesce to a 0 partition sum
    val withNulls = Seq((1L, 10L, Some(3L)), (2L, 9L, None), (3L, 8L, Some(4L)))
      .toDF("doc_id", "score", "wt")
    val kept = Sampling.budgetSelect(withNulls, "doc_id", "score", "wt", 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L))
  }
}
