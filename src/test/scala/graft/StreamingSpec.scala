package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Ev, Session}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val H = 3600000L

  test("tumbling window aggregation over a memory stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingAgg(input.toDF())
      .writeStream.format("memory").queryName("tumbling").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(1, 1, "click", 0L, 10),
        Ev(2, 1, "click", H / 2, 20),
        Ev(3, 2, "view", H / 4, 5))
      q.processAllAvailable()
      // advance watermark beyond window 0 + 1h lateness → emit it
      input.addData(Ev(4, 1, "click", 3 * H, 1))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select("win_start", "event_type", "n", "sum_v4")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(rows.contains((0L, "click", 2L, 30L)))
      assert(rows.contains((0L, "view", 1L, 5L)))
    } finally q.stop()
  }

  test("hopping window aggregation: every event lands in exactly two overlapping windows") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = EventStreams.hoppingAgg(input.toDF())
      .writeStream.format("memory").queryName("hopping").outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(1, 1, "click", 0L, 10),       // windows [-30m,30m) and [0,1h)
        Ev(2, 1, "click", H / 2, 20),    // windows [0,1h) and [30m,90m)
        Ev(3, 2, "view", H / 4, 5))      // windows [-30m,30m) and [0,1h)
      q.processAllAvailable()
      input.addData(Ev(4, 1, "click", 4 * H, 1)) // advance watermark, close them
      q.processAllAvailable()
      val rows = spark.table("hopping")
        .select("win_start", "event_type", "n", "sum_v4")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(rows.contains((-H / 2, "click", 1L, 10L)))
      assert(rows.contains((0L, "click", 2L, 30L)))
      assert(rows.contains((H / 2, "click", 1L, 20L)))
      assert(rows.contains((-H / 2, "view", 1L, 5L)))
      assert(rows.contains((0L, "view", 1L, 5L)))
      // batch twin invariant on the same data: 2 windows per event
      val batch = Seq((0L, "click", 10L), (H / 2, "click", 20L), (H / 4, "view", 5L))
        .flatMap { case (ms, et, _) =>
          Seq(ms - Math.floorMod(ms, H / 2), ms - Math.floorMod(ms, H / 2) - H / 2).map((_, et))
        }
      assert(batch.size == 6)
      batch.foreach { case (w, et) =>
        assert(rows.exists(r => r._1 == w && r._2 == et), s"missing window ($w, $et)")
      }
    } finally q.stop()
  }

  test("streaming drops exactly the events the batch watermark counterfactual flags late") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // arrival order (event_id) with one event 3h behind the high-water
    // mark under a 1h allowed lateness: tumblingAgg must drop it, and
    // Watermark.lateness with the same delay must flag it — and only it
    val evs = Seq(
      Ev(1, 1, "click", 0L, 1),
      Ev(2, 1, "click", 3 * H, 1), // hwm -> 3h
      Ev(3, 1, "click", H + 1, 1), // 3h - (H+1) > 1h late -> dropped + flagged
      Ev(4, 1, "click", 3 * H - 1, 1), // within lateness -> kept, not flagged
      Ev(5, 1, "click", 6 * H, 1)) // closes everything
    val flagged = graft.operators.Watermark
      .lateness(evs.toDF(), "event_id", "ms", delayMs = H)
      .select("event_id", "is_late").as[(Long, Boolean)].collect().toMap
    assert(flagged == Map(1L -> false, 2L -> false, 3L -> true, 4L -> false, 5L -> false))
    val input = MemoryStream[Ev]
    val q = EventStreams.tumblingAgg(input.toDF())
      .writeStream.format("memory").queryName("latedrop").outputMode(OutputMode.Append).start()
    try {
      evs.foreach { e => input.addData(e); q.processAllAvailable() }
      val rows = spark.table("latedrop")
        .select("win_start", "n").as[(Long, Long)].collect().toMap
      // window [1h,2h) would hold event 3 — it was late, so the window
      // never materializes; window [0,1h) holds only event 1
      assert(rows.get(0L).contains(1L))
      assert(!rows.contains(H), "the too-late event must have been dropped")
      // event 4 (t=3h-1) lands in [2h,3h); event 2 in [3h,4h)
      assert(rows.get(2 * H).contains(1L))
      assert(rows.get(3 * H).contains(1L))
    } finally q.stop()
  }

  test("streaming anomaly scoring flags a spike window against the batch-trained profile") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // batch-trained profile: 10 history days of 10 events + one of
    // 100 for type "click" (the ev_anomaly numbers: spike day flags,
    // steady days don't); "view" history is constant → sigma 0
    val history = ((0 until 9).map(d => ("click", d.toLong, 10L)) :+ ("click", 9L, 100L)) ++
      (0 until 6).map(d => ("view", d.toLong, 7L))
    val stats = graft.operators.EventStats.volumeStats(
      history.toDF("event_type", "day", "n"), "event_type", "n")

    val D = 86400000L
    val input = MemoryStream[Ev]
    val q = EventStreams.anomalyScore(input.toDF(), stats)
      .writeStream.format("memory").queryName("anom").outputMode(OutputMode.Append).start()
    try {
      // live day 0: 100 "click" events (a spike vs mean 19), 7 "view"
      // events (exactly its constant history → sigma 0, clean), and 3
      // of a type the profile has NEVER seen (the most anomalous case
      // — must flag, not vanish through an inner join)
      input.addData((1 to 100).map(i => Ev(i.toLong, 1, "click", i.toLong, 1)) ++
        (1 to 7).map(i => Ev(200L + i, 1, "view", i.toLong, 1)) ++
        (1 to 3).map(i => Ev(300L + i, 1, "signup", i.toLong, 1)): _*)
      q.processAllAvailable()
      input.addData(Ev(999, 1, "click", 2 * D, 1)) // advance watermark past day 0
      q.processAllAvailable()
      val rows = spark.table("anom")
        .select("win_start", "event_type", "n", "outlier")
        .as[(Long, String, Long, Long)].collect().toSet
      // click: n=100, N=10, S=190, Q=10900 → dev=810, 656100 > 291600 → flag
      assert(rows.contains((0L, "click", 100L, 1L)), rows.toString)
      // view: n=7 equals its constant history → strict rule stays clean
      assert(rows.contains((0L, "view", 7L, 0L)), rows.toString)
      // unseen key: flags via the left-join null branch
      assert(rows.contains((0L, "signup", 3L, 1L)), rows.toString)
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("deduped").outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(1, 1, "click", 10 * H, 10), Ev(1, 1, "click", 10 * H, 10), Ev(2, 1, "view", 10 * H + 1, 5))
      q.processAllAvailable()
      input.addData(Ev(1, 1, "click", 10 * H + 2, 10)) // duplicate again, same batch horizon
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L), ids.mkString(","))
    } finally q.stop()
  }

  test("stream-static as-of enrichment mirrors the batch asofBackward cases") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // the static dimension side — same rows as OperatorsSpec's asof
    // spec: an equal-time tie (eid 7 vs 9 at t=100) and a key the
    // stream never matches at-or-before
    val dim = Seq((10L, 100L, 7L), (10L, 100L, 9L), (10L, 200L, 11L), (20L, 150L, 13L))
      .toDF("k", "rt", "eid")
    def run(strict: Boolean): Map[Long, (Option[Long], Option[Long])] = {
      val input = MemoryStream[(Long, Long, Long)]
      val name = s"asof_stream_$strict"
      val q = EventStreams.asofEnrich(input.toDF().toDF("oid", "k", "t"),
          "k", "t", dim, "k", "rt", Seq("eid"), strict = strict)
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append).start()
      try {
        input.addData((1L, 10L, 100L), (2L, 10L, 250L))
        q.processAllAvailable()
        // later micro-batch: same stateless probe, no cross-batch state
        input.addData((3L, 20L, 100L), (4L, 30L, 500L))
        q.processAllAvailable()
        spark.table(name).select("oid", "asof_time", "asof_eid")
          .as[(Long, Option[Long], Option[Long])].collect()
          .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
      } finally q.stop()
    }
    val incl = run(strict = false)
    // equal-time match included; ties at the same time go to max payload
    assert(incl(1L) == ((Some(100L), Some(9L))))
    assert(incl(2L) == ((Some(200L), Some(11L))))
    // no dim row at-or-before t=100 for key 20; key 30 unknown
    assert(incl(3L) == ((None, None)))
    assert(incl(4L) == ((None, None)))
    val strict = run(strict = true)
    assert(strict(1L) == ((None, None)), "strict must not see the equal-time row")
    assert(strict(2L) == ((Some(200L), Some(11L))))
  }

  test("quality scoring and language ID run UNCHANGED on a document stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // both are stateless narrow column pipelines — stream-safe as-is,
    // like dedupAgainst/stratifiedSample below; the stream emits the
    // batch-identical scores for the same rows
    val input = MemoryStream[(Long, String)]
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs away."),
      (2L, "zzz !!! ??? ###")).toDF("doc_id", "text")
    val q = graft.text.TextAnalysis.qualityDf(input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("quality_stream").outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, "The quick brown fox jumps over the lazy dog and runs away."),
        (2L, "zzz !!! ??? ###"))
      q.processAllAvailable()
      val streamed = spark.table("quality_stream").collect().map(_.toSeq).toSet
      val batch = graft.text.TextAnalysis.qualityDf(docs, "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming near-dup dedup drops reformatted copies via the simhash key") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    val q = EventStreams.dedupNearDocs(input.toDF().toDF("doc_id", "text", "ms"),
        "doc_id", "text", "ms")
      .writeStream.format("memory").queryName("neardup_stream").outputMode(OutputMode.Append).start()
    val base = 10 * H
    try {
      input.addData((1L, "The Quick Brown Fox", base))
      q.processAllAvailable()
      // reformatted copy (case + whitespace): same token bag → same
      // simhash → dropped, even across micro-batches
      input.addData((2L, "the   quick BROWN fox", base + 1), (3L, "an unrelated document body", base + 2))
      q.processAllAvailable()
      val kept = spark.table("neardup_stream").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L), kept.mkString(","))
      // the signature rides the output for downstream joins
      assert(spark.table("neardup_stream").columns.contains("simhash64"))
    } finally q.stop()
  }

  test("incremental dedup and stratified sampling run UNCHANGED on a document stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // stream-static LEFT ANTI join: the batch operator is stream-safe
    // as-is (static reference side, stateless stream side, no
    // watermark needed)
    val reference = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val q = graft.dedup.Dedup.dedupAgainst(input.toDF().toDF("doc_id", "text"),
        reference, "doc_id", "text")
      .writeStream.format("memory").queryName("dd_inc_stream").outputMode(OutputMode.Append).start()
    try {
      input.addData((10L, "alpha"), (11L, "gamma"))
      q.processAllAvailable()
      input.addData((12L, "beta"), (13L, "delta"))
      q.processAllAvailable()
      val kept = spark.table("dd_inc_stream").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(11L, 13L))
    } finally q.stop()

    // hash-deterministic sampling: stateless narrow filter — the
    // stream emits exactly the batch sample for the same rows (a
    // rand() sampler would diverge between replays)
    val sIn = MemoryStream[(Long, String)]
    val rates = Map("a" -> 1.0, "b" -> 0.25)
    val q2 = graft.sample.Sampling.stratifiedSample(
        sIn.toDF().toDF("doc_id", "source"), "doc_id", "source", rates, defaultRate = 0.5)
      .writeStream.format("memory").queryName("smp_stream").outputMode(OutputMode.Append).start()
    val rows = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    try {
      sIn.addData(rows: _*)
      q2.processAllAvailable()
      val streamed = spark.table("smp_stream").select("doc_id").as[Long].collect().toSet
      val batch = graft.sample.Sampling.stratifiedSample(
          rows.toDF("doc_id", "source"), "doc_id", "source", rates, defaultRate = 0.5)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch && streamed.contains(0L))
    } finally q2.stop()
  }

  test("stream-stream interval join matches per-user events within the window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val lin = MemoryStream[Ev]
    val rin = MemoryStream[Ev]
    val q = EventStreams.intervalJoin(lin.toDF(), rin.toDF())
      .writeStream.format("memory").queryName("ivjoin").outputMode(OutputMode.Append).start()
    try {
      val base = 100 * H
      lin.addData(Ev(1, 5, "click", base, 0))
      rin.addData(
        Ev(10, 5, "view", base + H / 2, 7),   // in window
        Ev(11, 5, "view", base + 3 * H, 9),   // outside (+1h)
        Ev(12, 6, "view", base, 8))           // other user
      q.processAllAvailable()
      // advance both watermarks so results flush
      lin.addData(Ev(2, 99, "click", base + 10 * H, 0))
      rin.addData(Ev(13, 99, "view", base + 10 * H, 0))
      q.processAllAvailable()
      val rows = spark.table("ivjoin")
        .select("l_event_id", "r_event_id").as[(Long, Long)].collect().toSet
      assert(rows.contains((1L, 10L)), rows.toString)
      assert(!rows.contains((1L, 11L)) && !rows.contains((1L, 12L)), rows.toString)
    } finally q.stop()
  }

  test("streaming funnel emits exactly one hit per completing user, in-order stages only") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = EventStreams.funnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_hits").outputMode(OutputMode.Append).start()
    val base = 10 * H
    try {
      // user 1 completes across batches; user 2 clicks BEFORE viewing
      input.addData(Ev(1, 1, "view", base, 0), Ev(2, 2, "click", base, 0))
      q.processAllAvailable()
      input.addData(Ev(3, 1, "click", base + H, 0), Ev(4, 2, "view", base + H, 0))
      q.processAllAvailable()
      input.addData(Ev(5, 1, "purchase", base + 2 * H, 0), Ev(6, 2, "purchase", base + 2 * H, 0))
      q.processAllAvailable()
      // user 1 purchases AGAIN: no second emission
      input.addData(Ev(7, 1, "purchase", base + 3 * H, 0))
      q.processAllAvailable()
      val rows = spark.table("funnel_hits").as[EventStreams.FunnelHit].collect()
      assert(rows.toSeq == Seq(EventStreams.FunnelHit(1L, base, base + H, base + 2 * H)), rows.mkString(", "))
      // user 2 never had a click strictly after a view followed by purchase:
      // click(base) preceded view(base+H) → stage 2 unreachable until a new
      // click arrives; purchase alone must not emit
      assert(!rows.exists(_.user_id == 2L))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions on watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val gap = EventStreams.DefaultGapMs
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append).start()
    val base = 10 * H // stay clear of the epoch-0 initial watermark boundary
    try {
      // session 1: two events 1h apart; then nothing for > gap
      input.addData(Ev(1, 7, "click", base, 10), Ev(2, 7, "click", base + H, 20))
      q.processAllAvailable()
      // far-future event advances the watermark past session1 end + gap,
      // closing it; it also opens session 2
      input.addData(Ev(3, 7, "click", base + 10 * gap, 5))
      q.processAllAvailable()
      input.addData(Ev(4, 7, "click", base + 20 * gap, 1))
      q.processAllAvailable()
      // user 9's far-future event advances the watermark while user 7
      // has NO data → user 7's open session closes via TIMEOUT
      input.addData(Ev(5, 9, "click", base + 60 * gap, 2))
      q.processAllAvailable()
      // user 7 returns: numbering must RESUME (session 4), not restart at 1
      input.addData(Ev(6, 7, "click", base + 70 * gap, 3))
      input.addData(Ev(7, 9, "click", base + 200 * gap, 1)) // close session 4 via timeout
      q.processAllAvailable()
      val rows = spark.table("sessions").as[Session].collect()
      val s1 = rows.find(_.session_idx == 1L)
      assert(s1.exists(s => s.n_events == 2 && s.start_ms == base && s.end_ms == base + H && s.sum_v4 == 30L), rows.mkString(", "))
      val u7 = rows.filter(_.user_id == 7L).map(_.session_idx).sorted.toSeq
      assert(u7 == u7.distinct, s"duplicate session indices after timeout: ${rows.mkString(", ")}")
      assert(u7.contains(4L), s"post-timeout session did not resume numbering: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("encoder-free DataFrame twins run on a plain tuple stream (no caller .as[Ev])") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val gap = EventStreams.DefaultGapMs
    val base = 10 * H
    // plain tuple stream with int ids: the wrapper must cast/project
    // internally — nothing Ev-typed on the caller side
    val input = MemoryStream[(Int, Int, String, Long, Int)]
    val q = EventStreams.sessionizeDf(
        input.toDF().toDF("event_id", "user_id", "event_type", "ms", "v4"))
      .writeStream.format("memory").queryName("sessions_df").outputMode(OutputMode.Append).start()
    try {
      input.addData((1, 7, "click", base, 10), (2, 7, "click", base + H, 20))
      q.processAllAvailable()
      input.addData((3, 7, "click", base + 10 * gap, 5)) // closes session 1
      q.processAllAvailable()
      val rows = spark.table("sessions_df")
        .select("user_id", "session_idx", "n_events", "sum_v4")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows.contains((7L, 1L, 2L, 30L)), rows.mkString(", "))
    } finally q.stop()

    val fIn = MemoryStream[(Int, Int, String, Long, Int)]
    val fq = EventStreams.funnelDf(
        fIn.toDF().toDF("event_id", "user_id", "event_type", "ms", "v4"))
      .writeStream.format("memory").queryName("funnel_df").outputMode(OutputMode.Append).start()
    try {
      fIn.addData((1, 5, "view", base, 0), (2, 5, "click", base + 1, 0), (3, 5, "purchase", base + 2, 0))
      fq.processAllAvailable()
      val hits = spark.table("funnel_df")
        .select("user_id", "view_ms", "click_ms", "purchase_ms")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(hits == Seq((5L, base, base + 1, base + 2)), hits.mkString(", "))
    } finally fq.stop()
  }

  test("streaming KMV sketch equals the batch kmvDistinct on the same window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    // k = 8 over 30 distinct users → the estimator path (not exact);
    // a second sparse window stays on the exact path (n < k)
    val evs = (1 to 60).map(i => Ev(i.toLong, (i % 30).toLong, "view", (i % 7) * 60000L, 0)) ++
      Seq(Ev(100, 1, "click", H + 1, 0), Ev(101, 2, "click", H + 2, 0))
    val q = EventStreams.kmvDistinctWindows(input.toDF(), k = 8)
      .writeStream.format("memory").queryName("kmv_stream").outputMode(OutputMode.Update).start()
    try {
      // split across micro-batches: the sketch must MERGE, not restart
      input.addData(evs.take(20): _*)
      q.processAllAvailable()
      input.addData(evs.drop(20): _*)
      q.processAllAvailable()
      // last emission per (window, group) is the final sketch
      val streamed = spark.table("kmv_stream")
        .groupBy("win_start", "event_type")
        .agg(org.apache.spark.sql.functions.last("n_kept").as("n_kept"),
          org.apache.spark.sql.functions.last("est_distinct_fp2").as("est"))
        .as[(Long, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val batch = graft.sketch.Sketches.kmvDistinct(
        evs.toDF().withColumn("win_start",
          org.apache.spark.sql.functions.expr(s"ms - pmod(ms, $H)")),
        Seq("win_start", "event_type"), "user_id", k = 8)
        .as[(Long, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(batch((0L, "view"))._1 == 8L)       // estimator path exercised
      assert(batch((H, "click"))._1 == 2L)       // exact path exercised
    } finally q.stop()
  }

  test("streaming CMS cells equal the batch sketch build per window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val evs = (1 to 50).map(i =>
      Ev(i.toLong, i.toLong, Seq("view", "click", "purchase")(i % 3), (i % 5) * 60000L, 0))
    val q = EventStreams.cmsCellsStream(input.toDF(), d = 4, w = 64)
      .writeStream.format("memory").queryName("cms_cells").outputMode(OutputMode.Append).start()
    try {
      input.addData(evs.take(25): _*)
      q.processAllAvailable()
      input.addData(evs.drop(25): _*)
      q.processAllAvailable()
      // close window 0: advance the watermark past end + lateness
      input.addData(Ev(999, 999, "view", 5 * H, 0))
      q.processAllAvailable()
      val streamed = spark.table("cms_cells").filter($"win_start" === 0L)
        .select("j", "b", "cnt").as[(Int, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // batch rebuild of the same window's cells via the shared bucket fn
      val batch = evs.toDF()
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array((0 until 4).map(j =>
            org.apache.spark.sql.functions.struct(
              org.apache.spark.sql.functions.lit(j).as("j"),
              graft.sketch.Sketches.cmsBucket($"event_type", j, 64).as("b"))): _*)).as("e"))
        .groupBy($"e.j", $"e.b").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
        .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed == batch, s"streamed ${streamed.size} cells vs batch ${batch.size}")
      // state bound: never more than d·w cells per window
      assert(streamed.size <= 4 * 64)
    } finally q.stop()
  }

  test("streaming quantile cells sum-merge into the batch histogram; rank scan matches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, conv, lit, md5, substring, sum => fsum, count => fcount}
    val input = MemoryStream[Ev]
    val evs = (1 to 60).map(i =>
      Ev(i.toLong, i.toLong, Seq("view", "click")(i % 2), (i % 4) * 60000L, (i % 7).toLong * 1000L))
    val q = EventStreams.quantileCellsStream(input.toDF())
      .writeStream.format("memory").queryName("q_cells").outputMode(OutputMode.Append).start()
    try {
      input.addData(evs.take(30): _*)
      q.processAllAvailable()
      input.addData(evs.drop(30): _*)
      q.processAllAvailable()
      input.addData(Ev(999, 999, "view", 5 * H, 0)) // close window 0
      q.processAllAvailable()
      val streamed = spark.table("q_cells").filter($"win_start" === 0L)
        .select("event_type", "v4", "k", "ks").as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val batch = evs.toDF()
        .select(col("event_type"), col("v4"),
          (conv(substring(md5(concat(lit("qs:"), col("event_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") < 536870912L).cast("long").as("in_s"))
        .groupBy("event_type", "v4")
        .agg(fcount(lit(1)).as("k"), fsum("in_s").as("ks"))
        .as[(String, Long, Long, Long)].collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(streamed == batch, s"streamed ${streamed.size} cells vs batch ${batch.size}")
      // the emitted cells drive the same offline rank scan: exact p50
      // from cumulative k equals a brute per-group sorted pick
      streamed.keys.map(_._1).toSeq.distinct.foreach { et =>
        val cells = streamed.filter(_._1._1 == et).toSeq.map { case ((_, v), (k, _)) => (v, k) }.sortBy(_._1)
        val n = cells.map(_._2).sum
        var cum = 0L
        val p50 = cells.collectFirst { case (v, k) if { cum += k; cum >= (n + 1) / 2 } => v }.get
        val brute = evs.filter(_.event_type == et).map(_.v4).sorted.apply((((n + 1) / 2) - 1).toInt)
        assert(p50 == brute, s"$et p50 from streamed cells")
      }
      // state bound: cells ≤ |value domain| × groups, not row count
      assert(streamed.size <= 7 * 2)
    } finally q.stop()
  }

  test("streaming HLL registers max-merge across windows into the exact batch sketch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max}
    val input = MemoryStream[Ev]
    // two windows, two event types, overlapping user sets — the merge
    // across windows must collapse to the batch registers over ALL events
    val evs = (1 to 400).map(i => Ev(i.toLong, (i % 150).toLong,
      if (i % 3 == 0) "click" else "view", (i % 2) * H + (i % 50) * 60000L, 0))
    val q = EventStreams.hllRegistersStream(input.toDF(), p = 8)
      .writeStream.format("memory").queryName("hll_regs").outputMode(OutputMode.Append).start()
    try {
      // split across micro-batches: register state must MERGE, not restart
      input.addData(evs.take(150): _*)
      q.processAllAvailable()
      input.addData(evs.drop(150): _*)
      q.processAllAvailable()
      // close both windows: advance the watermark past end + lateness
      input.addData(Ev(9999, 9999, "view", 6 * H, 0))
      q.processAllAvailable()
      val emitted = spark.table("hll_regs").filter($"win_start" < 6 * H)
      // per-window state bound: ≤ m register rows per (window, group)
      val perWin = emitted.groupBy("win_start", "event_type")
        .count().as[(Long, String, Long)].collect()
      assert(perWin.nonEmpty && perWin.forall(_._3 <= 256), perWin.mkString(","))
      // max-merge the two windows' registers, estimate, compare to the
      // one-shot batch sketch over all events — bit-for-bit
      val merged = graft.sketch.Sketches.hllEstimate(
        emitted.groupBy("event_type", "bkt").agg(max(col("mb")).as("mb")),
        Seq("event_type"), p = 8)
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val batch = graft.sketch.Sketches.hllDistinct(
        evs.toDF(), Seq("event_type"), "user_id", p = 8)
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(merged == batch, s"merged $merged vs batch $batch")
      // and hllEstimate re-maxes, so the RAW emitted rows (duplicate
      // (group,bkt) across windows) feed it directly too
      val direct = graft.sketch.Sketches.hllEstimate(
        emitted.select("event_type", "bkt", "mb"), Seq("event_type"), p = 8)
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(direct == batch)
    } finally q.stop()
  }

  test("streaming CDC compaction emits minimal upserts; final state equals batch latest-wins") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.{Chg, Upsert}
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def pack(seq: Long, cents: Long, opRank: Long, flagRank: Long): Long =
      ((seq * 34359738368L + cents) * 4 + opRank) * 4 + flagRank
    val input = MemoryStream[Chg]
    val q = CdcStream.latestUpserts(input.toDS())
      .writeStream.format("memory").queryName("cdc_upserts")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two keys insert
      input.addData(Chg(10, pack(1, 500, 2, 0)), Chg(20, pack(1, 900, 2, 1)))
      q.processAllAvailable()
      val b1 = spark.table("cdc_upserts").as[Upsert].collect()
      assert(b1.map(_.key).sorted.toSeq == Seq(10L, 20L))
      assert(b1.forall(_.op == "I"))
      // batch 2: key 10 advances (update), key 20 REGRESSES (late
      // replay of an older change — must emit nothing), key 30 deletes
      input.addData(Chg(10, pack(3, 700, 1, 2)), Chg(20, pack(0, 111, 1, 0)),
        Chg(30, pack(2, 0, 0, 0)))
      q.processAllAvailable()
      val b2 = spark.table("cdc_upserts").as[Upsert].collect()
      assert(b2.length == b1.length + 2, s"late replay must not emit: ${b2.mkString(", ")}")
      val k10 = b2.filter(_.key == 10L).maxBy(_.packed)
      assert(k10.op == "U" && k10.total_c == 700L && k10.status == "R")
      assert(b2.filter(_.key == 30L).head.op == "D")
      // duplicate replay of the current winner: absorbed, no emission
      input.addData(Chg(10, pack(3, 700, 1, 2)))
      q.processAllAvailable()
      assert(spark.table("cdc_upserts").count() == b2.length)
      // final state (last upsert per key) == batch latest-wins compaction
      val all = Seq(
        10L -> pack(1, 500, 2, 0), 20L -> pack(1, 900, 2, 1),
        10L -> pack(3, 700, 1, 2), 20L -> pack(0, 111, 1, 0),
        30L -> pack(2, 0, 0, 0), 10L -> pack(3, 700, 1, 2))
      val batchLatest = all.groupBy(_._1).map { case (k, cs) =>
        CdcStream.decode(k, cs.map(_._2).max)
      }.toSet
      val streamLatest = spark.table("cdc_upserts").as[Upsert].collect()
        .groupBy(_.key).map(_._2.maxBy(_.packed)).toSet
      assert(streamLatest == batchLatest)
    } finally q.stop()
  }
}
