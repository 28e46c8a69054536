package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch event operators
  * (`ev_window_agg`, `ev_sessionize` in graft.queries.Pipeline).
  *
  * The input contract is the `events` schema projected to engine-exact
  * types: (event_id long, user_id long, event_type string, ms long
  * epoch-millis, v4 long fixed-point value). Both operators are
  * watermark-driven so state is bounded: late data beyond the
  * watermark is dropped, session state times out after the gap.
  *
  * Scale: state is partitioned by the grouping key (window/user), so
  * both scale horizontally with executors; no global state.
  */
object EventStreams {

  case class Ev(event_id: Long, user_id: Long, event_type: String, ms: Long, v4: Long)
  case class Session(user_id: Long, session_idx: Long, n_events: Long, start_ms: Long, end_ms: Long, sum_v4: Long)
  // public: Spark's product encoder codegen needs accessible accessors
  case class SessState(sessionIdx: Long, n: Long, startMs: Long, endMs: Long, sumV4: Long)

  val DefaultGapMs: Long = 21600000L // 6h — matches the batch twin

  /** Watermarked tumbling-window aggregation: 1h windows keyed by
    * event_type, 1h allowed lateness. Emits (win_start ms, event_type,
    * n, sum_v4) — same output schema as the batch `ev_window_agg`.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("v4").as("sum_v4"))
      .select(
        unix_millis(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_v4"))

  /** Watermarked HOPPING-window aggregation — the streaming twin of
    * the batch `ev_sliding_window` (size 1h, hop 30min: every event
    * lands in exactly 2 overlapping windows). Spark's `window(ts,
    * size, hop)` plans the same bounded replicate-then-hash-agg the
    * batch explode writes by hand; the 1h watermark closes each
    * window once event time passes its end + lateness. Output schema
    * matches the batch twin: (win_start ms, event_type, n, sum_v4).
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("v4").as("sum_v4"))
      .select(
        unix_millis(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_v4"))

  /** Streaming volume-anomaly scoring — the deploy shape of
    * `ev_anomaly`: the per-key volume profile (N, S, Q) is TRAINED in
    * batch ([[graft.operators.EventStats.volumeStats]] over history)
    * and each closed tumbling window of the live stream is flagged
    * against it with EXACTLY the batch predicate
    * ([[graft.operators.EventStats.outlierFlag]] — one shared
    * expression, so batch and stream can never drift for keys the
    * profile covers). Watermark bounds the window state; the profile
    * joins as a broadcast static frame (LEFT join: a key the history
    * has never seen is the MOST anomalous case, so its windows flag
    * outlier = 1 instead of silently vanishing through an inner
    * join), so scoring adds no stream-side shuffle beyond the
    * windowed count itself.
    *
    * Output per closed window: (win_start, key, n, outlier).
    */
  def anomalyScore(events: DataFrame, statsStatic: DataFrame,
                   keyCol: String = "event_type", windowLen: String = "1 day",
                   k: Int = 2): DataFrame = {
    import graft.operators.EventStats
    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(statsStatic), Seq(keyCol), "left")
      .select(
        unix_millis(col("window.start")).as("win_start"),
        col(keyCol), col("n"),
        when(col("_nd").isNull, 1L)
          .otherwise(EventStats.outlierFlag(col("n"), col("_nd"), col("_tot"), col("_sumsq"), k))
          .as("outlier"))
  }

  /** Stream-stream interval join: enrich each left event with right
    * events for the same user within [−before, +after] of its event
    * time. Both sides are watermarked so join state is bounded —
    * Spark drops buffered rows once the watermark passes the interval.
    * Output: left event_id/ms + matched right event_id/ms/v4.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      beforeMs: Long = 3600000L,
      afterMs: Long = 3600000L,
      latenessMs: Long = 3600000L,
      excludeSameId: Boolean = false): DataFrame = {
    val l = left
      .withColumn("l_ts", timestamp_millis(col("ms")))
      .withWatermark("l_ts", s"$latenessMs milliseconds")
      .select(col("event_id").as("l_event_id"), col("user_id").as("l_user"), col("ms").as("l_ms"), col("l_ts"))
    val r = right
      .withColumn("r_ts", timestamp_millis(col("ms")))
      .withWatermark("r_ts", s"$latenessMs milliseconds")
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user"), col("ms").as("r_ms"),
        col("v4").as("r_v4"), col("r_ts"))
    val window =
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $beforeMs MILLISECONDS") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $afterMs MILLISECONDS")
    // excludeSameId is for self-joining one stream with itself (shared
    // id space); two independent streams keep same-id pairs
    val cond = if (excludeSameId) window && col("l_event_id") =!= col("r_event_id") else window
    l.join(r, cond)
      .select("l_event_id", "l_user", "l_ms", "r_event_id", "r_ms", "r_v4")
  }

  /** Stream-static as-of enrichment: attach to each streaming event
    * the LATEST static-side row with the same key whose time is ≤ the
    * event's time — point-in-time enrichment of a live stream against
    * a slowly-changing dimension (rates, model versions, configs).
    *
    * Twin of the batch [[graft.operators.AsofJoin]], delegating to its
    * lookup shape, which is stream-safe by construction: the static
    * side pre-groups into per-key time-sorted payload arrays (batch
    * work, broadcast when small), and the stream side is a
    * stream-static equi-join + STATELESS per-row array probe — no
    * watermark, no state store, nothing buffered across batches.
    * Semantics (latest-at-or-before, equal-time ties to max payload,
    * `strict` excluding equal time, unmatched → null) are the batch
    * operator's, spec-mirrored on a MemoryStream against
    * OperatorsSpec's asofBackward cases.
    */
  def asofEnrich(events: DataFrame, eventKey: String, eventTime: String,
                 dim: DataFrame, dimKey: String, dimTime: String,
                 payloadCols: Seq[String], prefix: String = "asof_",
                 strict: Boolean = false): DataFrame =
    graft.operators.AsofJoin.asofLookup(
      events, eventKey, eventTime, dim, dimKey, dimTime, payloadCols, prefix, strict)

  /** Streaming exact dedup within the watermark horizon: drop repeat
    * event_ids (at-least-once source → exactly-once downstream).
    * State is bounded by the watermark — the batch twin is dd_exact.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .drop("ts")

  /** Streaming NEAR-duplicate document dedup within the watermark
    * horizon: key the dedup on the native 64-bit SimHash signature
    * instead of the raw text, so reformatted copies (case, whitespace,
    * token order within the bag — anything [[graft.dedup.Dedup
    * .simhash64Native]] normalizes away) drop alongside byte-exact
    * ones. This is the signature-COLLISION tier of near-dup (Hamming
    * 0); Hamming ≤ k banding needs cross-row joins that streaming
    * state can't express bounded — run the batch
    * [[graft.dedup.Dedup.simhashPairs64]] as the exact backfill, the
    * same split as funnel/sessionize batch twins.
    *
    * Input: (idCol, textCol, msCol epoch-millis). Output: first-seen
    * rows plus their `simhash64` (the dedup key, for downstream
    * joins). State = one signature per distinct doc within the
    * watermark — bounded by the horizon, not the corpus.
    */
  def dedupNearDocs(docs: DataFrame, idCol: String, textCol: String,
                    msCol: String, lateness: String = "1 hour"): DataFrame =
    docs
      .withColumn("simhash64", graft.dedup.Dedup.simhash64Native(col(textCol)))
      .withColumn("ts", timestamp_millis(col(msCol)))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("simhash64")
      .drop("ts")

  /** Streaming count-min sketch build: watermarked per-window cell
    * counts over the same d×w md5 bucketing as the batch
    * [[graft.sketch.Sketches.cmsFreq]]. The d-row explode collapses in
    * the streaming agg's own state — ≤ d·w rows of state per window,
    * independent of event volume — and because CMS merges by
    * CELL-WISE ADD, the incremental per-window sketches union across
    * windows (or across a stream/batch boundary) by summing cnt. The
    * estimate probe stays a batch concern ([[graft.sketch.Sketches
    * .cmsFreq]]'s min-over-rows join on the emitted cells).
    * Output (Append, on watermark close): win_start, j, b, cnt.
    */
  def cmsCellsStream(events: DataFrame, keyCol: String = "event_type",
                     d: Int = 4, w: Int = 64,
                     windowMs: Long = 3600000L, lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", lateness)
      .select(col("ts"), (col("ms") - pmod(col("ms"), lit(windowMs))).as("win_start"),
        explode(array((0 until d).map(j =>
          struct(lit(j).as("j"), graft.sketch.Sketches.cmsBucket(col(keyCol), j, w).as("b"))): _*)).as("e"))
      .groupBy(window(col("ts"), s"$windowMs milliseconds"), col("win_start"),
        col("e.j").as("j"), col("e.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win_start"), col("j"), col("b"), col("cnt"))

  /** Streaming quantile-sketch histogram: watermarked per-window
    * (group, fp4-value) cell counts for BOTH populations — all rows
    * (k) and the deterministic 1/8 md5 content-hash sample (ks) —
    * the same cells the batch `ev_quantile_sketch` rank-scans. The
    * agg state is VALUE-DOMAIN-bounded (distinct quantized values
    * per window × group, never row count), and cells SUM-merge
    * across windows / the stream-batch boundary (a histogram's
    * merge law), so emitted rows feed the identical offline rank
    * scan. The md5 gate uses the SAME column expression as the
    * batch query, so streamed ks equals the batch sample count
    * bit-for-bit (spec-asserted).
    * Output (Append, on watermark close): win_start, <keyCol>, v4, k, ks.
    */
  def quantileCellsStream(events: DataFrame, keyCol: String = "event_type",
                          idCol: String = "event_id",
                          windowMs: Long = 3600000L, lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", lateness)
      .select(col("ts"), (col("ms") - pmod(col("ms"), lit(windowMs))).as("win_start"),
        col(keyCol), col("v4"),
        (conv(substring(md5(concat(lit("qs:"), col(idCol).cast("string"))), 1, 8), 16, 10)
          .cast("long") < 536870912L).cast("long").as("in_s"))
      .groupBy(window(col("ts"), s"$windowMs milliseconds"), col("win_start"),
        col(keyCol), col("v4"))
      .agg(count(lit(1)).as("k"), sum("in_s").as("ks"))
      .select(col("win_start"), col(keyCol), col("v4"), col("k"), col("ks"))

  /** Streaming HyperLogLog register build: watermarked per-window
    * (group, bucket) max-ρ over the SAME uniform/bucket/ρ columns as
    * the batch [[graft.sketch.Sketches.hllRegisters]]. The streaming
    * agg's state IS the sketch — ≤ m register rows per (window,
    * group), independent of event volume — and because HLL merges by
    * elementwise register MAX, the per-window sketches max-merge
    * across windows, days, or the stream/batch boundary into exactly
    * the registers a one-shot batch build produces
    * ([[graft.sketch.Sketches.hllEstimate]] re-maxes its input, so
    * the emitted rows feed it directly; bit-equality is
    * spec-asserted). Output (Append, on watermark close):
    * win_start, <keyCol>, bkt, mb.
    */
  def hllRegistersStream(events: DataFrame, keyCol: String = "event_type",
                         valueCol: String = "user_id", p: Int = 8,
                         windowMs: Long = 3600000L, lateness: String = "1 hour"): DataFrame = {
    val (bkt, rho) = graft.sketch.Sketches.hllBucketRho(col("_u"), p)
    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", lateness)
      .select(col("ts"), (col("ms") - pmod(col("ms"), lit(windowMs))).as("win_start"),
        col(keyCol), graft.sketch.Sketches.hllUniform(col(valueCol)).as("_u"))
      .select(col("ts"), col("win_start"), col(keyCol), bkt.as("bkt"), rho.as("_rho"))
      .groupBy(window(col("ts"), s"$windowMs milliseconds"), col("win_start"),
        col(keyCol), col("bkt"))
      .agg(max(col("_rho")).as("mb"))
      .select(col("win_start"), col(keyCol), col("bkt"), col("mb"))
  }

  case class KmvRow(win_start: Long, grp: String, u: Double)
  // the state IS the sketch: bottom-k distinct md5-uniforms — k
  // doubles per active (window, group), mergeable by union+re-bottom
  case class KmvState(hashes: List[Double])
  case class KmvEstimate(win_start: Long, event_type: String, n_kept: Long, est_distinct_fp2: Long)

  /** Streaming twin of [[graft.sketch.Sketches.kmvDistinct]]: per
    * tumbling window × event_type, a running bottom-k (KMV)
    * distinct-user estimate. The group state is the sketch itself —
    * k doubles, NOT the distinct set — so memory is bounded by
    * active (window, group) pairs regardless of cardinality, and
    * merging a micro-batch is union + re-bottom (the sketch's own
    * merge law). The md5-uniform hash is computed with the SAME
    * column expression as the batch sketch before the typed
    * boundary, so for in-order data the streamed estimate equals the
    * batch estimate bit-for-bit (spec-asserted). Update-mode output:
    * each trigger re-emits updated groups; state expires (with one
    * final emission) once the watermark passes window end + lateness.
    */
  def kmvDistinctWindows(events: DataFrame, valueCol: String = "user_id",
                         k: Int = 64, windowMs: Long = 3600000L,
                         latenessMs: Long = 3600000L): Dataset[KmvEstimate] = {
    require(k >= 2, s"kmvDistinctWindows: k must be ≥ 2, got $k")
    implicit val rowEnc = Encoders.product[KmvRow]
    implicit val stEnc = Encoders.product[KmvState]
    implicit val outEnc = Encoders.product[KmvEstimate]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)

    def estimate(key: (Long, String), st: KmvState): KmvEstimate = {
      val n = st.hashes.size
      val est = if (n < k) n.toDouble else (k - 1).toDouble / st.hashes.max
      KmvEstimate(key._1, key._2, n.toLong, math.floor(est * 100.0 + 0.5).toLong)
    }

    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", s"$latenessMs milliseconds")
      .select(
        (col("ms") - pmod(col("ms"), lit(windowMs))).as("win_start"),
        col("event_type").as("grp"),
        graft.sample.Sampling.hashUniform(col(valueCol), "kmv").as("u"),
        col("ts"))
      .as[KmvRow]
      .groupByKey(r => (r.win_start, r.grp))
      .mapGroupsWithState[KmvState, KmvEstimate](GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[KmvRow], state: GroupState[KmvState]) =>
          val st = state.getOption.getOrElse(KmvState(Nil))
          if (state.hasTimedOut) {
            state.remove()
            estimate(key, st) // final emission, then the k doubles are gone
          } else {
            val merged = KmvState(
              (st.hashes ++ rows.map(_.u)).distinct.sorted.take(k))
            state.update(merged)
            state.setTimeoutTimestamp(math.max(
              key._1 + windowMs + latenessMs, state.getCurrentWatermarkMs() + 1))
            estimate(key, merged)
          }
      }
  }

  // funnel state: stage times reached so far (-1 = not reached), plus
  // a done flag so a completion emits exactly once
  case class FunnelState(t1: Long, t2: Long, t3: Long, done: Boolean)
  case class FunnelHit(user_id: Long, view_ms: Long, click_ms: Long, purchase_ms: Long)

  /** Streaming twin of the batch `ev_funnel`: emit one row per user
    * the moment they complete stage1 → stage2 → stage3 with strictly
    * increasing event times. Per-user state is three longs + a flag,
    * expired via event-time timeout after `idleTimeoutMs` beyond the
    * watermark — bounded by ACTIVE users, not event volume.
    *
    * In-order parity with the batch operator; a cross-batch
    * out-of-order pair (stage2 processed before a late stage1) can
    * miss, as in any bounded-state streaming funnel — the batch twin
    * is the exact backfill.
    */
  def funnel(
      events: Dataset[Ev],
      stages: (String, String, String) = ("view", "click", "purchase"),
      idleTimeoutMs: Long = 86400000L): Dataset[FunnelHit] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelHit]
    implicit val keyEnc = Encoders.scalaLong
    val (s1, s2, s3) = stages

    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "1 hour")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle user: drop the three longs
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, done = false))
            var hit: Option[FunnelHit] = None
            rows.toSeq.sortBy(e => (e.ms, e.event_id)).foreach { e =>
              if (!st.done) {
                if (e.event_type == s1 && st.t1 < 0) st = st.copy(t1 = e.ms)
                else if (e.event_type == s2 && st.t1 >= 0 && st.t2 < 0 && e.ms > st.t1) st = st.copy(t2 = e.ms)
                else if (e.event_type == s3 && st.t2 >= 0 && st.t3 < 0 && e.ms > st.t2) {
                  st = st.copy(t3 = e.ms, done = true)
                  hit = Some(FunnelHit(userId, st.t1, st.t2, st.t3))
                }
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleTimeoutMs)
            hit.iterator
          }
      }
  }

  /** DataFrame-in/DataFrame-out twin of [[funnel]]: normalizes the
    * event columns to the Ev contract internally (explicit casts +
    * library-compiled product encoder), so REPL/SQL users call it on
    * any frame with (event_id, user_id, event_type, ms, v4)-shaped
    * columns — no `import spark.implicits._`, no caller-side `.as[Ev]`
    * or encoder derivation. */
  def funnelDf(events: DataFrame,
               stages: (String, String, String) = ("view", "click", "purchase"),
               idleTimeoutMs: Long = 86400000L): DataFrame =
    funnel(toEv(events), stages, idleTimeoutMs).toDF()

  /** DataFrame-in/DataFrame-out twin of [[sessionize]] — see
    * [[funnelDf]] for the encoder-free contract. */
  def sessionizeDf(events: DataFrame, gapMs: Long = DefaultGapMs): DataFrame =
    sessionize(toEv(events), gapMs).toDF()

  /** Project/cast any compatible frame onto the Ev contract with the
    * library's own encoder (compiled case class — safe without REPL
    * reflection setup). */
  private def toEv(events: DataFrame): Dataset[Ev] = {
    implicit val evEnc = Encoders.product[Ev]
    events.select(
      col("event_id").cast("long"), col("user_id").cast("long"),
      col("event_type").cast("string"), col("ms").cast("long"),
      col("v4").cast("long")).as[Ev]
  }

  /** Gap-based sessionization via flatMapGroupsWithState with
    * event-time timeout: a session closes (and is emitted) when the
    * watermark passes its end + gap. Same semantics as the batch
    * `ev_sessionize` for in-order data.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long = DefaultGapMs): Dataset[Session] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong

    events
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "1 hour")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed session end + gap → close and emit; keep
            // a tombstone (n = 0) carrying the session counter so a
            // later session for this user continues numbering instead
            // of colliding with session 1 (batch-twin parity). One
            // tombstone row per user — state stays bounded by users.
            val s = state.get
            state.update(s.copy(n = 0))
            Iterator.single(Session(userId, s.sessionIdx, s.n, s.startMs, s.endMs, s.sumV4))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ms, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if s.n > 0 && e.ms - s.endMs <= gapMs =>
                  cur = Some(s.copy(n = s.n + 1, endMs = math.max(s.endMs, e.ms), sumV4 = s.sumV4 + e.v4))
                case Some(s) if s.n > 0 =>
                  closed ::= Session(userId, s.sessionIdx, s.n, s.startMs, s.endMs, s.sumV4)
                  cur = Some(SessState(s.sessionIdx + 1, 1, e.ms, e.ms, e.v4))
                case Some(tombstone) => // closed earlier: resume numbering
                  cur = Some(SessState(tombstone.sessionIdx + 1, 1, e.ms, e.ms, e.v4))
                case None =>
                  cur = Some(SessState(1, 1, e.ms, e.ms, e.v4))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (s.n > 0) state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
