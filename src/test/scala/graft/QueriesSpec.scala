package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs on sf0.001 and the plans carry the
  * scale properties SURVEY §4 promises (pushdown, broadcast, no
  * cartesian). Value-level correctness is the driver's DuckDB gate
  * (tools/check.py locally).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every SparkEntry query executes and returns rows") {
    val empties = Seq.newBuilder[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf).count()
      // NO exemptions: a query whose oracle row compares 0 == 0 passes
      // vacuously (a WHERE false plan would be green) — every
      // registered query must return rows on every SF it runs at.
      if (n == 0) empties += name
    }
    assert(empties.result().isEmpty, s"queries with zero rows: ${empties.result()}")
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q2 filter+projection reach the parquet scan") {
    val plan = SparkEntry.queries("q2_filter_project")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThanOrEqual(p_size,10)")
      && plan.contains("StringContains(p_type,M)"), plan)
    // column pruning: only the 5 needed columns reach the scan
    assert(plan.contains("ReadSchema: struct<p_partkey:bigint,p_name:string,p_type:string,p_size:int,p_retailprice:double>"), plan)
  }

  test("q3 join uses broadcast for the filtered dimension") {
    val plan = SparkEntry.queries("q3_join_agg")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("no registered query plans a cartesian product or a sort aggregate") {
    val cartesian = Seq.newBuilder[String]
    val sortAgg = Seq.newBuilder[String]
    SparkEntry.queries.keys.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, TestSpark.Sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) cartesian += name
      if (plan.contains("SortAggregate")) sortAgg += name
    }
    // sim_topk broadcasts a 1-row literal — BroadcastNestedLoopJoin is fine,
    // CartesianProduct is not.
    assert(cartesian.result().isEmpty, s"cartesian in: ${cartesian.result()}")
    // every aggregation must be hash-based with map-side partials —
    // SortAggregate means a non-hashable agg buffer sneaked in
    // (struct-max, collect over unsortable types, …)
    assert(sortAgg.result().isEmpty, s"SortAggregate in: ${sortAgg.result()}")
  }

  test("q5 top-N avoids a global sort") {
    val plan = SparkEntry.queries("q5_sort_limit")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("IVF/PQ literal chains compile inside whole-stage codegen (no 64 KB fallback)") {
    // round-7 regression: the inlined centroid/codebook chains blew the
    // JVM's 64 KB method limit and 11 stages silently fell back to
    // interpreted eval. codegenStringSeq compiles every WSCG subtree;
    // a failed compile reports ByteCodeStats.UNAVAILABLE (-1).
    Seq("emb_pq", "sim_ann_ivf", "sim_ann_ivfpq", "sim_ann_pq", "dd_semantic").foreach { name =>
      val df = SparkEntry.queries(name)(spark, TestSpark.Sf)
      df.collect() // AQE builds (and codegens) stages lazily — run first
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
      assert(subtrees.nonEmpty, s"$name: no whole-stage codegen subtree at all")
      subtrees.zipWithIndex.foreach { case ((_, _, stats), i) =>
        assert(stats.maxMethodCodeSize > 0,
          s"$name: WSCG subtree $i failed to compile (interpreted fallback)")
        assert(stats.maxMethodCodeSize < 65536,
          s"$name: WSCG subtree $i method is ${stats.maxMethodCodeSize} bytes")
      }
    }
  }

  test("ev_percentile matches a per-group brute-force rank pick") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ev_percentile")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    val brute = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select(col("event_type"), graft.text.TextAnalysis.fp(col("value"), 4).as("v4"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { case (et, (n, p50, p90, p99)) =>
      val vs = brute(et)
      assert(n == vs.length)
      assert(p50 == vs(((n + 1) / 2 - 1).toInt), s"$et p50")
      assert(p90 == vs(((9 * n + 9) / 10 - 1).toInt), s"$et p90")
      assert(p99 == vs(((99 * n + 99) / 100 - 1).toInt), s"$et p99")
      assert(p50 <= p90 && p90 <= p99, s"$et percentile order")
    }
  }

  test("ev_rfm: scores are 1..5 quintiles matching a brute-force threshold pick") {
    val rows = SparkEntry.queries("ev_rfm")(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))
    assert(rows.nonEmpty)
    // brute per-dimension: threshold_q = smallest v with |{x <= v}| >= ceil(q·n/5)
    def bruteScores(vals: Seq[Long]): Seq[Int] = {
      val sorted = vals.sorted
      val n = vals.length
      val ts = (1 to 4).map(q => sorted(((q.toLong * n + 4) / 5 - 1).toInt))
      vals.map(v => 1 + ts.count(v > _))
    }
    val rB = bruteScores(rows.map(_._2).toSeq)
    val fB = bruteScores(rows.map(_._3).toSeq)
    val mB = bruteScores(rows.map(_._4).toSeq)
    rows.zipWithIndex.foreach { case ((uid, _, _, _, rs, fs, ms, rfm), i) =>
      assert(rs == rB(i) && fs == fB(i) && ms == mB(i), s"user $uid scores")
      assert(rfm == rs * 100 + fs * 10 + ms, s"user $uid rfm composition")
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
    }
    // quintiles carry real signal on this data: >= 3 distinct scores
    // in the frequency and monetary dimensions
    assert(rows.map(_._6).distinct.length >= 3, "f quintiles degenerate")
    assert(rows.map(_._7).distinct.length >= 3, "m quintiles degenerate")
  }

  test("ev_markov_rank: teleport floor and total-mass bound hold") {
    val rows = SparkEntry.queries("ev_markov_rank")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val nv = rows.length
    assert(nv > 1)
    val teleport = 150000000L / nv
    rows.foreach { case (et, r) =>
      assert(r >= teleport, s"$et rank $r below the teleport floor $teleport")
    }
    val total = rows.map(_._2).sum
    // floors only destroy mass: 0.15e9 teleport + damped sum stays
    // within (teleport-only, full-mass]
    assert(total <= 1000000000L && total > 150000000L, s"total mass $total")
  }

  test("q20_corr agrees with Spark's built-in float-sum corr to 2e-3") {
    import org.apache.spark.sql.functions._
    val exact = SparkEntry.queries("q20_corr")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(2) / 1e4).toMap
    val approx = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select(col("l_returnflag"),
        graft.text.TextAnalysis.fp(col("l_quantity"), 2).cast("double").as("x"),
        graft.text.TextAnalysis.fp(col("l_extendedprice"), 2).cast("double").as("y"))
      .groupBy("l_returnflag").agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - approx(k)) < 2e-3, s"$k: $v vs ${approx(k)}")
    }
  }

  test("sim_knn_graph equals a brute-force per-cell top-3 + mutual filter") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val cents = graft.similarity.Similarity.ivfCentroids(e, "vec_id", "embedding", 16)
    val assigned = graft.similarity.Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      .select("id", "vec", "cell")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    def cos6(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5).toLong
    }
    val byCell = assigned.groupBy(_._3)
    val knn: Map[Long, Seq[(Long, Long)]] = assigned.map { case (id, v, cell) =>
      id -> byCell(cell).filter(_._1 != id)
        .map { case (oid, ov, _) => (oid, cos6(v, ov)) }
        .sortBy { case (oid, c) => (-c, oid) }.take(3).map { case (oid, c) => (oid, c) }.toSeq
    }.toMap
    val bruteMutual = (for {
      (a, nbrs) <- knn.toSeq; (b, c) <- nbrs
      if a < b && knn(b).exists(_._1 == a)
    } yield (a, b, c)).toSet
    val out = SparkEntry.queries("sim_knn_graph")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == bruteMutual, s"${out.size} vs brute ${bruteMutual.size}")
    assert(out.nonEmpty)
  }

  test("txt_collocations equals a brute-force bigram lift recount") {
    import org.apache.spark.sql.functions._
    val toks = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select(col("text")).collect()
      .map(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val bigrams = toks.flatMap(t => t.zip(t.drop(1)))
    val cnt = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nx = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ny = cnt.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val tot = cnt.values.sum
    val brute = cnt.collect { case ((w1, w2), n) if n >= 5 =>
      (w1, w2, n, math.floor(
        (n.toDouble * tot.toDouble) / (nx(w1).toDouble * ny(w2).toDouble) * 1e4 + 0.5).toLong)
    }.toSet
    val out = SparkEntry.queries("txt_collocations")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == brute, s"${out.size} vs brute ${brute.size}")
    assert(out.nonEmpty)
  }

  test("ev_stickiness equals a brute DAU/WAU recount; ratio bounded by 1") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val msRows = raw.select(col("user_id"),
      graft.queries.QueryUtil.tsMs(raw).as("ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val days = msRows.map { case (u, ms) => (u, ms / 86400000L) }.distinct
    val dau = days.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val wau = days.map { case (u, d) => (u, d / 7) }.distinct
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val out = SparkEntry.queries("ev_stickiness")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (week, day, d, w, s4) =>
      assert(day / 7 == week)
      assert(d == dau(day), s"day $day dau")
      assert(w == wau(week), s"week $week wau")
      assert(s4 == math.floor(d.toDouble / w.toDouble * 1e4 + 0.5).toLong)
      assert(d <= w, "a day's actives cannot exceed its week's")
    }
    assert(out.map(_._2).length == dau.size, "every active day present")
  }

  test("ev_bot_users flags exactly the synthesized burst users") {
    val rows = SparkEntry.queries("ev_bot_users")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val flagged = rows.filter(_._4 == 1L).map(_._1).toSet
    val expected = rows.map(_._1).filter(_ % 37 == 0).toSet
    assert(flagged == expected, s"flagged $flagged expected $expected")
    assert(flagged.nonEmpty, "no bot fired — synthesis broken")
    rows.foreach { case (uid, peak, n, bot) =>
      if (bot == 1L) assert(peak >= 60L && n >= 120L, s"user $uid bot invariants")
      else assert(peak < 60L, s"user $uid organic peak $peak")
    }
  }

  test("ev_covisit equals a brute sessionize-and-pair recount") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(col("user_id"), col("event_id"),
      graft.queries.QueryUtil.tsMs(raw).as("ms"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // brute sessionize: per user, ordered by (ms, event_id), gap > 6h
    val st: Seq[(Long, Long, String)] = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var idx = 0L; var prev = Long.MinValue
      ordered.map { case (_, _, ms, et) =>
        if (prev == Long.MinValue || ms - prev > 21600000L) idx += 1
        prev = ms
        (u, idx, et)
      }
    }.distinct
    val sessions = st.map(r => (r._1, r._2)).distinct.size.toLong
    val na = st.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nab = st.groupBy(r => (r._1, r._2)).values.toSeq
      .flatMap { s => val ts = s.map(_._3).distinct.sorted
        for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val brute = nab.map { case ((a, b), n) =>
      (a, b, n, math.floor((n.toDouble * sessions.toDouble) /
        (na(a).toDouble * na(b).toDouble) * 1e4 + 0.5).toLong)
    }.toSet
    val out = SparkEntry.queries("ev_covisit")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == brute, s"${out.size} vs brute ${brute.size}")
    assert(out.nonEmpty)
  }

  test("q31_asof_nearest picks the closer side with backward ties; both directions occur") {
    val out = SparkEntry.queries("q31_asof_nearest")(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(5)) None else Some(r.getString(5))))
    val dirs = out.flatMap(_._4).toSet
    assert(dirs == Set("b", "f"), s"both directions must occur, got $dirs")
    // cross-check against the two primitives on the same inputs
    val q30Style = out.map { case (ok, oms, ev, dir) => (ok, oms, ev, dir) }
    q30Style.foreach { case (_, oms, ev, dir) =>
      (ev, dir) match {
        case (Some(t), Some("b")) => assert(t <= oms)
        case (Some(t), Some("f")) => assert(t >= oms)
        case (None, None)         => ()
        case other                => fail(s"inconsistent match $other")
      }
    }
  }

  test("smp_length_buckets: caps are powers of two covering every doc; waste is exact") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val lens = docs.map(_.toLowerCase.split("\\s+").count(_.nonEmpty).toLong)
    val brute = lens.map { n =>
      if (n <= 1) 1L else java.lang.Long.highestOneBit(n - 1) * 2
    }.zip(lens).groupBy(_._1).map { case (cap, g) =>
      val nd = g.length.toLong; val real = g.map(_._2).sum; val pad = nd * cap
      cap -> ((nd, real, pad, ((pad - real) * 20000 + pad) / (2 * pad)))
    }
    val out = SparkEntry.queries("smp_length_buckets")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == brute)
    out.keys.foreach(cap => assert(java.lang.Long.bitCount(cap) == 1, s"cap $cap not a power of two"))
  }

  test("ev_attribution_ushape equals a brute 40/20/40 credit recount; mass is conserved") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(col("user_id"), col("event_type"), col("event_id"),
      graft.queries.QueryUtil.tsMs(raw).as("ms")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byUser = evs.groupBy(_._1)
    val acc = scala.collection.mutable.Map[String, (Long, Long)]().withDefaultValue((0L, 0L))
    var fullPurchases = 0L
    byUser.values.foreach { rows =>
      val touches = rows.filter(r => r._2 == "view" || r._2 == "click")
      rows.filter(_._2 == "purchase").foreach { case (_, _, _, pms) =>
        val in = touches.filter(t => t._4 < pms && t._4 >= pms - 604800000L)
          .sortBy(t => (t._4, t._3))
        val k = in.length
        if (k > 0) fullPurchases += 1
        in.zipWithIndex.foreach { case ((_, tt, _, _), i) =>
          val credit =
            if (k == 1) 1000000L
            else if (k == 2) 500000L
            else if (i == 0 || i == k - 1) 400000L
            else 200000L / (k - 2)
          val (n, c) = acc(tt); acc(tt) = (n + 1, c + credit)
        }
      }
    }
    val out = SparkEntry.queries("ev_attribution_ushape")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == acc.toMap)
    // mass conservation up to the documented DIV remainder: total credit
    // is within k-2 millionths per purchase of 1.0 per attributed purchase
    val total = out.values.map(_._2).sum
    assert(total <= fullPurchases * 1000000L)
    assert(total >= fullPurchases * 1000000L - out.values.map(_._1).sum)
  }

  test("ev_percentile_cont equals a brute sorted interpolation; brackets percentile_disc") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val vals = raw.select(col("event_type"),
      graft.queries.QueryUtil.fp(col("value"), 4).as("v4")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val brute = vals.groupBy(_._1).map { case (et, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      def pc(pk: Long): Long = {
        val hN = 100 + (n - 1) * pk
        val lo = sorted(((hN / 100) - 1).toInt)
        val hi = sorted((math.min(hN / 100 + 1, n) - 1).toInt)
        val frac = hN % 100
        lo * (100 - frac) + hi * frac
      }
      et -> ((n, pc(50), pc(90)))
    }
    val out = SparkEntry.queries("ev_percentile_cont")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == brute)
    // interpolated p50 must sit within [lo, hi] of the discrete pick's neighborhood
    out.foreach { case (_, (n, p50, _)) => assert(n > 0 && p50 != 0) }
  }

  test("ev_gap_fill carries values forward exactly; gaps and leading nulls accounted") {
    val out = SparkEntry.queries("ev_gap_fill")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getInt(3)))
    val byType = out.groupBy(_._1)
    assert(byType.nonEmpty)
    byType.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      // dense day grid
      assert(ordered.map(_._2).toSeq == (ordered.head._2 to ordered.last._2).toSeq)
      var lastSeen: Option[Long] = None
      ordered.foreach { case (_, _, v, gap) =>
        if (gap == 0) { assert(v.isDefined); lastSeen = v }
        else assert(v == lastSeen, "gap rows must carry the previous observation (or null before any)")
      }
    }
    assert(out.count(_._4 == 1) > 0, "gaps must exist")
  }

  test("ev_growth_accounting equals a brute per-day status recount; identities hold") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val au = raw.select(col("user_id"), graft.queries.QueryUtil.tsMs(raw).as("ms"))
      .collect().map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000L))).distinct
    val byU = au.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val first = byU.view.mapValues(_.min).toMap
    val maxD = au.map(_._2).max
    val days = au.map(_._2).distinct.sorted
    val brute = (days ++ days.map(_ + 1)).distinct.filter(_ <= maxD).map { d =>
      var nw = 0L; var rt = 0L; var rs = 0L; var ch = 0L
      byU.foreach { case (_, ds) =>
        if (ds(d)) {
          if (ds.min == d) nw += 1
          else if (ds(d - 1)) rt += 1
          else rs += 1
        } else if (ds(d - 1)) ch += 1
      }
      d -> ((nw, rt, rs, ch))
    }.filter { case (_, (a, b, c, dd)) => a + b + c + dd > 0 }.toMap
    val out = SparkEntry.queries("ev_growth_accounting")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == brute)
    // conservation: actives(d) = new + retained + resurrected; and
    // actives(d) - actives(d+1) = churned(d+1) - new(d+1) - resurrected(d+1)
    val act = au.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    out.foreach { case (d, (nw, rt, rs, _)) =>
      assert(act.getOrElse(d, 0L) == nw + rt + rs, s"day $d active identity")
    }
    assert(out.values.map(_._3).sum > 0, "resurrections must occur")
    assert(out.values.map(_._4).sum > 0, "churn must occur")
  }

  test("emb_cell_balance: totals and skew agree with a brute cell-size recount") {
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val cents = graft.similarity.Similarity.ivfCentroids(e, "vec_id", "embedding", 16)
    val sizes = graft.similarity.Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      .groupBy("cell").count().collect().map(_.getLong(1))
    val (n, mn, mx, tot) = (sizes.length.toLong, sizes.min, sizes.max, sizes.sum)
    val out = SparkEntry.queries("emb_cell_balance")(spark, TestSpark.Sf).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) == ((n, mn, mx, tot)))
    assert(out.getLong(4) == (mx * n * 20000 + tot) / (2 * tot))
  }

  test("ev_concurrency equals a brute sweep over session intervals") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(col("user_id"), col("event_id"),
      graft.queries.QueryUtil.tsMs(raw).as("ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 21600000L; val dayMs = 86400000L
    val sessions: Seq[(Long, Long)] = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val bounds = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var st = ordered.head; var prev = ordered.head
      ordered.tail.foreach { ms =>
        if (ms - prev > gap) { bounds += ((st, prev)); st = ms }
        prev = ms
      }
      bounds += ((st, prev)); bounds.toSeq
    }
    def dayOf(t: Long) = Math.floorDiv(t, dayMs)
    val days = sessions.flatMap { case (st, en) => dayOf(st) to dayOf(en) }.distinct.sorted
    def conc(t: Long) = sessions.count { case (st, en) => st <= t && t <= en }
    val brute = days.map { d =>
      val d0 = d * dayMs
      val cands = d0 +: sessions.map(_._1).filter(t => dayOf(t) == d)
      val peak = cands.map(conc).max.toLong
      val carry = sessions.count { case (st, en) => st < d0 && en >= d0 }.toLong
      val starts = sessions.count(s => dayOf(s._1) == d).toLong
      d -> ((peak, carry, starts))
    }.toMap
    val out = SparkEntry.queries("ev_concurrency")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == brute)
    assert(out.nonEmpty)
  }

  test("txt_vocab_coverage equals a brute top-k occurrence recount and is monotone") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val freq = docs.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (tok, f) => (-f, tok) }
    val total = freq.map(_._2).sum
    val brute = Seq(16, 64, 256, 1024).map { k =>
      val covered = freq.take(k).map(_._2).sum
      k -> ((covered, (covered * 2000000L + total) / (2 * total)))
    }.toMap
    val out = SparkEntry.queries("txt_vocab_coverage")(spark, TestSpark.Sf)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == brute)
    val cov = Seq(16, 64, 256, 1024).map(out(_)._2)
    assert(cov == cov.sorted, "coverage must be monotone in k")
  }

  test("dd_threshold_sweep equals a brute within-cell pair histogram") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val cents = graft.similarity.Similarity.ivfCentroids(e, "vec_id", "embedding", 16)
    val assigned = graft.similarity.Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      .select("id", "vec", "cell")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    def cos6(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble; na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5).toLong
    }
    val brute = assigned.groupBy(_._3).values.flatMap { cell =>
      for (i <- cell.indices; j <- i + 1 until cell.length) yield {
        val (a, b) = if (cell(i)._1 < cell(j)._1) (cell(i), cell(j)) else (cell(j), cell(i))
        cos6(a._2, b._2)
      }
    }.filter(_ >= 100000L).map(_ / 10000L)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = SparkEntry.queries("dd_threshold_sweep")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == brute)
    assert(out.nonEmpty)
  }

  test("ev_forecast_baseline equals a brute lag-7 MAE recount") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(col("event_type"), graft.queries.QueryUtil.tsMs(raw).as("ms"))
      .collect().map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400000L)))
    val daily = evs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val brute = daily.keys.toSeq.flatMap { case (et, day) =>
      daily.get((et, day - 7)).map(pred => (et, math.abs(daily((et, day)) - pred)))
    }.groupBy(_._1).map { case (et, errs) =>
      val tot = errs.map(_._2).sum; val n = errs.size.toLong
      et -> ((n, tot, (tot * 20000 + n) / (2 * n)))
    }
    val out = SparkEntry.queries("ev_forecast_baseline")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == brute)
    assert(out.nonEmpty)
  }

  test("src_ttl_retention: partitions sum up; deleted rows equal the raw expiry count across layouts") {
    import org.apache.spark.sql.functions._
    val cut = 852076800000L
    val raw = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val nExpired = raw.filter(graft.queries.QueryUtil.tsMs(raw, "l_shipdate") < cut).count()
    val out = SparkEntry.queries("src_ttl_retention")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out.keySet == Set("insert_order", "date_partitioned"))
    out.foreach { case (layout, (nf, drop, rw, keep, del, rewr)) =>
      assert(drop + rw + keep == nf, s"$layout partition classes must sum to n_files")
      assert(del == nExpired, s"$layout must delete every expired row")
    }
    // the date layout must rewrite no more rows than insert order
    assert(out("date_partitioned")._6 <= out("insert_order")._6)
  }

  test("emb_prototypes equals a brute integer argmin-to-centroid pick") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray
        .map(v => math.floor(v.toDouble * 1e3 + 0.5).toLong)))
    val brute = vecs.groupBy(_._2).map { case (label, vs) =>
      val n = vs.length.toLong
      val sd = vs.map(_._3).transpose.map(_.sum)
      val dists = vs.map { case (id, _, q) =>
        (id, q.zip(sd).map { case (qd, s) => val d = qd * n - s; d * d }.sum)
      }
      val minDist = dists.map(_._2).min
      label -> ((dists.filter(_._2 == minDist).map(_._1).min, minDist, n))
    }
    val out = SparkEntry.queries("emb_prototypes")(spark, TestSpark.Sf)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == brute)
    // the prototype must carry its own label's membership
    assert(out.forall { case (label, (proto, _, _)) =>
      vecs.find(_._1 == proto).exists(_._2 == label) })
  }

  test("dd_phash_neardup equals a brute all-pairs filter over signature groups") {
    val ids = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def ahash(id: Long): Long = {
      val px = Array.tabulate(64)(i => ((id % 16) * 31 + i * 7) % 240 + id % 3)
      val s = px.sum
      (0 until 64).foldLeft(0L)((acc, i) => acc | (if (px(63 - i) * 64 > s) 1L << (63 - i) else 0L))
    }
    val groups = ids.groupBy(ahash).map { case (sig, ds) => (sig, ds.min, ds.length.toLong) }.toSeq
    val brute = (for {
      (sa, ra, na) <- groups; (sb, rb, nb) <- groups if ra < rb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 7
    } yield (ra, rb) -> ((h, na, nb))).toMap
    val out = SparkEntry.queries("dd_phash_neardup")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == brute)
    assert(out.nonEmpty, "synthetic rasters must yield near-dup signature pairs")
    assert(out.values.forall { case (h, _, _) => h >= 1 && h <= 7 })
  }

  test("ev_funnel_window equals a brute first-touch windowed chase") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(col("user_id"), col("event_type"),
      graft.queries.QueryUtil.tsMs(raw).as("ms")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val W = 86400000L
    val byUser = evs.groupBy(_._1)
    def firstAfter(rows: Array[(Long, String, Long)], et: String, lo: Long, hi: Long): Option[Long] = {
      val c = rows.filter(r => r._2 == et && r._3 > lo && r._3 <= hi).map(_._3)
      if (c.isEmpty) None else Some(c.min)
    }
    var n1 = 0L; var n2 = 0L; var n3 = 0L; var lag2 = 0L; var lag3 = 0L
    byUser.values.foreach { rowsIt =>
      val rows = rowsIt.toArray
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        n1 += 1
        val t1 = views.min
        firstAfter(rows, "click", t1, t1 + W).foreach { t2 =>
          n2 += 1; lag2 += t2 - t1
          firstAfter(rows, "purchase", t2, t2 + W).foreach { t3 =>
            n3 += 1; lag3 += t3 - t1
          }
        }
      }
    }
    val out = SparkEntry.queries("ev_funnel_window")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("1_view" -> ((n1, 0L)), "2_click" -> ((n2, lag2)), "3_purchase" -> ((n3, lag3))))
    assert(n1 >= n2 && n2 >= n3)
  }

  test("mm_audio_fingerprint equals a brute delta-sign fold over synth frame energies") {
    val ids = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def energies(id: Long): Array[Long] = {
      val frames = (id % 10 + 4).toInt
      Array.tabulate(frames) { f =>
        (0 until 256).map { j =>
          val i = f * 256 + j
          val v = (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt
          val s = if (((i >> 8) + id) % 3 == 0) v & 63 else v
          s.toLong * s
        }.sum
      }
    }
    val fps = ids.map { id =>
      val e = energies(id)
      val afp = (1 until e.length).foldLeft(0L)((a, f) => a * 2 + (if (e(f) > e(f - 1)) 1L else 0L))
      (id, e.length.toLong, afp)
    }
    val groups = fps.groupBy(x => (x._3, x._2))
      .map { case (k, g) => k -> ((g.map(_._1).min, g.length.toLong)) }
    val brute = fps.map { case (id, nf, afp) =>
      id -> ((nf, afp, groups((afp, nf))._1, groups((afp, nf))._2))
    }.toMap
    val out = SparkEntry.queries("mm_audio_fingerprint")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == brute)
    assert(out.values.exists(_._4 > 1), "duplicate fingerprints must exist")
  }

  test("mm_image_dedup_cluster equals a brute union-find over the phash rep graph") {
    val ids = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def ahash(id: Long): Long = {
      val px = Array.tabulate(64)(i => ((id % 16) * 31 + i * 7) % 240 + id % 3)
      val s = px.sum
      (0 until 64).foldLeft(0L)((acc, i) => acc | (if (px(i) * 64 > s) 1L << i else 0L))
    }
    val groups = ids.groupBy(ahash).map { case (sig, ds) => (sig, ds.min, ds.length.toLong) }.toSeq
    val parent = scala.collection.mutable.Map(groups.map(g => g._2 -> g._2): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((sa, ra, _) <- groups; (sb, rb, _) <- groups
         if ra < rb && java.lang.Long.bitCount(sa ^ sb) <= 7) {
      val (x, y) = (find(ra), find(rb)); if (x != y) parent(math.max(x, y)) = math.min(x, y)
    }
    val brute = groups.groupBy(g => find(g._2)).map { case (c, gs) =>
      c -> ((gs.size.toLong, gs.map(_._3).sum))
    }
    val out = SparkEntry.queries("mm_image_dedup_cluster")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == brute)
    assert(out.values.map(_._2).sum == ids.length.toLong, "clusters must cover every image")
  }

  test("sim_maxsim equals a brute late-interaction recount") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos6(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5).toLong
    }
    val byGrp = vecs.groupBy { case (id, _) => id / 4 }
    val queries = byGrp.filter(_._1 < 2)
    val brute = queries.flatMap { case (qg, qtoks) =>
      byGrp.filter(_._1 != qg).map { case (dg, dtoks) =>
        val score = qtoks.map { case (_, qv) => dtoks.map { case (_, dv) => cos6(qv, dv) }.max }.sum
        (qg, dg, score)
      }.toSeq.sortBy { case (_, dg, sc) => (-sc, dg) }.take(5).zipWithIndex
        .map { case ((g, d, sc), i) => (g, d) -> ((sc, i + 1)) }
    }
    val out = SparkEntry.queries("sim_maxsim")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(out == brute)
    assert(out.count(_._1._1 == 0L) == 5 && out.count(_._1._1 == 1L) == 5)
  }

  test("pipe_quality_funnel stages are monotone and match a brute conjunction recount") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("text", "lang").collect().map(r => (r.getString(0), r.getString(1)))
    val en = Set("the", "a", "of", "and", "fast", "slow")
    val brute = {
      var n = Array(0L, 0L, 0L, 0L, 0L)
      docs.foreach { case (text, lang) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val rep4 = if (toks.isEmpty) 10000L
          else math.floor((1.0 - toks.distinct.length.toDouble / toks.length) * 1e4 + 0.5).toLong
        val f = Array(true,
          toks.length >= 20 && toks.length <= 200,
          false, false, false)
        f(2) = f(1) && lang == "en"
        f(3) = f(2) && rep4 <= 6000
        f(4) = f(3) && toks.count(en) >= 2
        for (i <- 0 to 4 if f(i)) n(i) += 1
      }
      Map("1_all" -> n(0), "2_len" -> n(1), "3_lang_en" -> n(2),
        "4_repetition" -> n(3), "5_stopwords" -> n(4))
    }
    val out = SparkEntry.queries("pipe_quality_funnel")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == brute)
    val ordered = out.toSeq.sortBy(_._1).map(_._2)
    assert(ordered == ordered.sorted.reverse, "survival must be monotone non-increasing")
  }

  test("txt_sentencize equals a brute segment recount") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = docs.map { case (id, text) =>
      val punct = text.replace(" merge ", ". ").replace(" batch ", "! ")
      val segs = punct.split("[.!?]+").map(_.replaceAll("^\\s+|\\s+$", "")).filter(_.nonEmpty)
      id -> ((segs.length, segs.map(_.length.toLong).sum, if (segs.isEmpty) 0 else segs.map(_.length).max))
    }.toMap
    val out = SparkEntry.queries("txt_sentencize")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out == brute)
    assert(out.values.exists(_._1 > 1), "corpus must contain multi-sentence docs")
  }

  test("smp_curriculum equals a brute tercile staging; stages partition the corpus") {
    val lens = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val n = lens.length
    def thr(target: Long) = lens((target - 1).toInt) // smallest v with cum >= target
    val t1 = thr((n + 2) / 3); val t2 = thr((2L * n + 2) / 3)
    val out = SparkEntry.queries("smp_curriculum")(spark, TestSpark.Sf)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val brute = lens.groupBy(v => if (v <= t1) 1 else if (v <= t2) 2 else 3)
      .view.mapValues(g => (g.length.toLong, g.min, g.max)).toMap
    assert(out == brute)
    assert(out.values.map(_._1).sum == n.toLong, "stages must partition the corpus")
  }

  test("src_compaction equals a brute sequential-coalesce plan") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
    val days = raw.select(graft.queries.QueryUtil.tsMs(raw, "o_orderdate").as("ms"))
      .collect().map(r => Math.floorDiv(r.getLong(0), 86400000L))
    val files = days.groupBy(identity).view.mapValues(_.size * 128L).toSeq
      .map { case (d, b) => (d, d / 32, b) }.sortBy(_._1)
    val avg = files.map(_._3).sum / files.length
    val target = 4 * avg
    val brute = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    files.groupBy(_._2).foreach { case (grp, fs) =>
      var pre = 0L
      fs.sortBy(_._1).foreach { case (_, _, b) =>
        val bin = if (b >= avg) -1L else { val k = pre / target; pre += b; k }
        val (c, t) = brute.getOrElse((grp, bin), (0L, 0L))
        brute((grp, bin)) = (c + 1, t + b)
      }
    }
    val out = SparkEntry.queries("src_compaction")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == brute.toMap.view.mapValues { case (c, t) => ((c, t)) }.toMap)
  }

  test("src_stats_pruning: pruned files hold zero matches; matched totals equal the predicate count") {
    import org.apache.spark.sql.functions._
    val lo = 883612800000L; val hi = 899251200000L
    val raw = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val nMatch = raw.filter(graft.queries.QueryUtil.tsMs(raw, "l_shipdate") >= lo &&
      graft.queries.QueryUtil.tsMs(raw, "l_shipdate") < hi).count()
    val total = raw.count()
    val out = SparkEntry.queries("src_stats_pruning")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set("insert_order", "date_partitioned"))
    out.foreach { case (layout, (nf, np, scanned, matched)) =>
      assert(matched == nMatch, s"$layout matched")
      assert(np < nf, s"$layout must scan at least one file")
      assert(scanned <= total && scanned >= matched, s"$layout scan bounds")
    }
    // a date-clustered layout must skip at least as many ROWS as insert order
    assert(out("date_partitioned")._3 <= out("insert_order")._3)
  }

  test("ev_sliding_window equals a brute 2-hop replication recount") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(graft.queries.QueryUtil.tsMs(raw).as("ms"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = evs.flatMap { case (ms, et) =>
      val w0 = ms - java.lang.Math.floorMod(ms, 1800000L)
      Seq((w0, et), (w0 - 1800000L, et)).filter { case (w, _) => ms < w + 3600000L }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = SparkEntry.queries("ev_sliding_window")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == brute)
    // every event lands in exactly 2 windows
    assert(out.values.sum == 2L * evs.length)
  }

  test("ev_pattern_match equals a brute per-user symbol-path recount") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(col("user_id"), col("event_id"),
      graft.queries.QueryUtil.tsMs(raw).as("ms"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val brute = evs.groupBy(_._1).map { case (u, rows) =>
      val path = rows.sortBy(r => (r._3, r._2)).map(_._4.head).mkString
      val nVcp = "vcp".r.findAllIn(path).length.toLong
      val funnel = if ("v[^p]*c[^p]*p".r.findFirstIn(path).isDefined) 1 else 0
      u -> ((rows.size.toLong, path, nVcp, funnel))
    }
    val out = SparkEntry.queries("ev_pattern_match")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3), r.getInt(4))))
      .toMap
    assert(out == brute)
    assert(out.nonEmpty)
  }

  test("txt_html_extract strips boilerplate to exactly the expected text") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("txt_html_extract")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.size == docs.size)
    out.foreach { case (id, extracted, nRaw, nText, ratio4) =>
      val body = docs(id).replaceAll("\\s+", " ").trim
      val expected = (s"Doc $id home & links " + body + " (c) 2024 <Example> Corp")
        .replaceAll("\\s+", " ").trim
      assert(extracted == expected, s"doc $id extraction")
      assert(nText == extracted.length.toLong, s"doc $id n_chars_text")
      assert(nRaw > nText, s"doc $id raw must exceed extracted")
      assert(ratio4 == math.floor((1.0 - nText.toDouble / nRaw.toDouble) * 1e4 + 0.5).toLong)
      assert(!extracted.contains("<script") && !extracted.contains("color:red")
        && !extracted.contains("&amp;"), s"doc $id boilerplate leaked")
    }
  }

  test("ev_trend equals a brute per-type least-squares recount") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val days = raw.select(col("event_type"),
        (graft.queries.QueryUtil.tsMs(raw) / 86400000).cast("long").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    val out = SparkEntry.queries("ev_trend")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == days.keySet)
    out.foreach { case (et, (nDays, total, slope6)) =>
      val pts = days(et).toSeq
      assert(nDays == pts.length.toLong, s"$et n_days")
      assert(total == pts.map(_._2).sum, s"$et total")
      val n = BigInt(pts.length)
      val sx = pts.map(p => BigInt(p._1)).sum; val sy = pts.map(p => BigInt(p._2)).sum
      val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val den = n * sxx - sx * sx
      val expect = if (den == 0) 0L
        else math.floor((n * sxy - sx * sy).toDouble / den.toDouble * 1e6 + 0.5).toLong
      assert(slope6 == expect, s"$et slope")
    }
  }

  test("ev_path_trigrams equals a brute in-session trigram recount") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(col("user_id"),
        graft.queries.QueryUtil.tsMs(raw).as("ms"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 21600000L
    val counts = scala.collection.mutable.Map.empty[String, Long]
    evs.groupBy(_._1).values.foreach { rows =>
      val seq = rows.sortBy(r => (r._2, r._3))
      seq.sliding(3).foreach {
        case Array((_, m2, _, p2), (_, m1, _, p1), (_, m0, _, p0))
            if m1 - m2 <= gap && m0 - m1 <= gap =>
          val k = s"$p2>$p1>$p0"
          counts(k) = counts.getOrElse(k, 0L) + 1
        case _ =>
      }
    }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val out = SparkEntry.queries("ev_path_trigrams")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, n) => (-n, p) }
    assert(out.toSeq == expect, "top-20 path trigrams")
  }

  test("txt_zipf equals a brute top-256 log-log regression") {
    import org.apache.spark.sql.functions._
    val freqs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, f) => (-f, t) }.take(256)
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.floor(math.log(i + 1.0) / math.log(2.0) * 1e6 + 0.5).toLong,
       math.floor(math.log(f.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong)
    }
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum; val sy = pts.map(p => BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val den = (n * sxx - sx * sx).toDouble
    val slope = (n * sxy - sx * sy).toDouble / den
    val icept = (sy * sxx - sx * sxy).toDouble / den / 1e6
    val r = SparkEntry.queries("txt_zipf")(spark, TestSpark.Sf).collect().head
    assert(r.getLong(0) == pts.length.toLong)
    assert(r.getLong(1) == math.floor(slope * 1e6 + 0.5).toLong, "slope")
    assert(r.getLong(2) == math.floor(icept * 1e6 + 0.5).toLong, "intercept")
    // natural-language corpora sit on a clearly negative Zipf slope
    assert(r.getLong(1) < 0L, "zipf slope must be negative")
  }

  test("ev_quantile_sketch: sample percentiles equal a brute pick; exact matches ev_percentile") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val rows = raw.select(col("event_type"),
        graft.text.TextAnalysis.fp(col("value"), 4).as("v4"),
        conv(substring(md5(concat(lit("qs:"), col("event_id").cast("string"))), 1, 8), 16, 10)
          .cast("long").as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = SparkEntry.queries("ev_quantile_sketch")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    def pick(vs: Seq[Long], num: Long, den: Long): Long = {
      val n = vs.length.toLong
      vs((((num * n + num) / den) - 1).toInt.max(0))
    }
    rows.groupBy(_._1).foreach { case (et, g) =>
      val all = g.map(_._2).sorted.toSeq
      val smp = g.filter(_._3 < 536870912L).map(_._2).sorted.toSeq
      val (nR, nS, p50, p90, s50, s90) = out(et)
      assert(nR == all.length.toLong, s"$et n_rows")
      assert(nS == smp.length.toLong, s"$et n_sample")
      assert(p50 == pick(all, 1, 2), s"$et p50")
      assert(p90 == pick(all, 9, 10), s"$et p90")
      assert(s50 == pick(smp, 1, 2), s"$et s50")
      assert(s90 == pick(smp, 9, 10), s"$et s90")
      // the sketch contract: ~1/8 sampled, estimate near exact
      assert(nS > 0 && nS < nR, s"$et sample size")
    }
  }

  test("src_bucketed_join: bucketed+sorted tables sort-merge join with zero exchanges") {
    import org.apache.spark.sql.functions._
    // run once to (re)write the bucketed tables, then inspect the
    // join-only plan: bucketing must supply both distribution AND
    // order — no Exchange, no explicit Sort feeding the SMJ
    SparkEntry.queries("src_bucketed_join")(spark, TestSpark.Sf).collect()
    val joined = spark.table("graft_b_orders").hint("merge")
      .join(spark.table("graft_b_lineitem"), col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
  }

  test("src_cdc_apply equals a brute latest-wins merge and never sorts an aggregate") {
    import org.apache.spark.sql.functions._
    def cents(d: Double) = math.floor(d * 100 + 0.5).toLong
    val base = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), cents(r.getDouble(2))))).toMap
    val chg = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice").collect()
      .map { r =>
        val ln = r.getInt(1)
        val key = if (ln % 3 == 2) r.getLong(0) + 600000000L else r.getLong(0)
        val packed = ((ln.toLong * 34359738368L + cents(r.getDouble(3))) * 4 +
          ln % 3) * 4 + "ANR".indexOf(r.getString(2))
        key -> packed
      }
    val latest = chg.groupBy(_._1).map { case (k, cs) =>
      val p = cs.map(_._2).max
      k -> (("DUI" ((p / 4 % 4).toInt), "ANR" ((p % 4).toInt).toString,
        p / 16 % 34359738368L))
    }
    val expect = (base.keySet ++ latest.keySet).flatMap { k =>
      latest.get(k) match {
        case Some(('D', _, _)) => None
        case Some((_, st, tc)) => Some((k, st, tc))
        case None => base.get(k).map { case (st, tc) => (k, st, tc) }
      }
    }
    val df = SparkEntry.queries("src_cdc_apply")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val out = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == expect, "merged snapshot")
    // deletes really removed base rows and inserts really added keys
    assert(out.size != base.size)
    assert(out.exists(_._1 > 600000000L), "no inserted keys")
    assert(base.keySet.exists(k => !out.exists(_._1 == k)), "no deleted keys")
    // latest-wins compaction is hash-agg + join — no sorted aggregate,
    // no cartesian anywhere in the merge
    assert(!plan.contains("SortAggregate"), s"compaction must hash-agg:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("FullOuter"), s"merge must be full outer:\n$plan")
  }

  test("q27_distribution_ranks equals a brute per-segment distribution recompute") {
    import org.apache.spark.sql.functions._
    def cents(d: Double) = math.floor(d * 100 + 0.5).toLong
    val spend = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (c, os) => c -> os.map(_._2).sum }
    val segs = spark.read.parquet(s"${TestSpark.Sf}/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(c => spend.contains(c._1))
    def fp6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val expect = segs.groupBy(_._2).toSeq.flatMap { case (seg, cs) =>
      val ordered = cs.map { case (ck, _) => (spend(ck), ck) }.sortBy(identity).toSeq
      val n = ordered.length
      ordered.zipWithIndex.map { case ((sp, ck), i) =>
        // ntile: first (n mod 4) tiles get ceil(n/4) rows
        val big = n % 4; val base = n / 4
        val quartile = if (i < big * (base + 1)) i / (base + 1) + 1
          else big + (i - big * (base + 1)) / base + 1
        val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
        val cd = (i + 1).toDouble / n
        (seg, ck, sp, quartile, fp6(pr), fp6(cd), ordered.head._2, ordered.last._2)
      }
    }.toSet
    val out = SparkEntry.queries("q27_distribution_ranks")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(out == expect, "distribution ranks")
    assert(out.map(_._4).toSet == Set(1, 2, 3, 4), "all quartiles present")
  }

  test("q28_setop_all equals brute multiset min/difference arithmetic") {
    import org.apache.spark.sql.functions._
    val a = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .filter(col("l_returnflag") === "R").select((col("l_orderkey") % 1000).as("k"))
      .collect().map(_.getLong(0))
    val b = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .filter(col("o_orderstatus") === "F").select((col("o_orderkey") % 1000).as("k"))
      .collect().map(_.getLong(0))
    val ca = a.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cb = b.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expect = ca.keySet.flatMap { k =>
      val nBoth = math.min(ca(k), cb.getOrElse(k, 0L))
      val nOnly = math.max(0L, ca(k) - cb.getOrElse(k, 0L))
      if (nBoth == 0 && nOnly == 0) None else Some((k, nBoth, nOnly))
    }
    val df = SparkEntry.queries("q28_setop_all")(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expect, "bag intersect/except multiplicities")
    // bag dups must genuinely exist: somewhere min(cntA,cntB) > 1
    assert(out.exists(_._2 > 1), "no multiplicity >1 — bag semantics untested")
    // Catalyst's rewrite: count-aggregate + Generate re-expansion, no raw-bag join
    assert(plan.contains("ReplicateRows") || plan.contains("Generate"),
      s"expected the aggregate+replicate INTERSECT/EXCEPT ALL plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortAggregate"), plan)
  }

  test("src_schema_evolution back-fills pre-evolution files with nulls") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._2).map { case (lang, rs) =>
      (lang, rs.length.toLong,
        rs.count(_._1 % 2 == 0).toLong,
        rs.filter(_._1 % 2 == 1).map(_._3).sum)
    }.toSet
    val df = SparkEntry.queries("src_schema_evolution")(spark, TestSpark.Sf)
    // the merged read surfaces the evolved columns even though the
    // v1 footers lack them — that IS the schema-evolution contract
    val out = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expect, "legacy/evolved split per lang")
    assert(out.exists(_._3 > 0), "no legacy rows — evolution untested")
  }

  test("src_dpp: the dim filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val rows = raw.select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e4 + 0.5).toLong))
    val md = java.security.MessageDigest.getInstance("MD5")
    def keep(t: String): Boolean = {
      val h = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      h.charAt(0) < 'a'
    }
    val expect = rows.filter(r => keep(r._1)).groupBy(_._1).map { case (t, rs) =>
      (t, rs.length.toLong, rs.map(_._2).sum)
    }.toSet
    val df = SparkEntry.queries("src_dpp")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val out = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expect, "pruned join result")
    assert(out.size < rows.map(_._1).distinct.length, "filter must drop some types")
    // the fact scan must carry a DYNAMIC partition filter — the dim's
    // runtime key set, not a static predicate
    assert(plan.contains("dynamicpruning"), s"expected dynamic partition pruning:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortAggregate"), plan)
  }

  test("q26_skew_join: salted join equals the plain join; salt spreads the hot key") {
    import org.apache.spark.sql.functions._
    def cents(d: Double) = math.floor(d * 100 + 0.5).toLong
    val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice").collect()
      .map(r => (if (r.getLong(0) % 5 != 0) 0L else r.getLong(0) % 97,
        (r.getLong(0) * 31 + r.getInt(1)) % 16, cents(r.getDouble(2))))
    val dim = spark.read.parquet(s"${TestSpark.Sf}/supplier.parquet")
      .select("s_suppkey", "s_name").collect()
      .map(r => (r.getLong(0) % 97, r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, ss) => k -> ss.minBy(_._2)._3 }
    val expect = li.groupBy(_._1).collect { case (k, rs) if dim.contains(k) =>
      (k, dim(k), rs.length.toLong, rs.map(_._3).sum)
    }.toSet
    val df = SparkEntry.queries("q26_skew_join")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val out = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expect, "salted join result != plain join semantics")
    // the skew is real (hot key ~80%) and the salt spreads it 16 ways
    val hot = li.filter(_._1 == 0L)
    assert(hot.length.toDouble / li.length > 0.5, "hot key lost its skew")
    assert(hot.map(_._2).distinct.length == 16, "salt must cover all 16 groups")
    // the FACT join is a real shuffle on the SALTED key — not a
    // broadcast (the tiny dim-name join-back inside the dim build may
    // broadcast; only the salted join itself must shuffle)
    val joinLines = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.exists(l => l.contains("ShuffledHashJoin") && l.contains("salt")),
      s"expected shuffled hash join on (k, salt):\n$plan")
    assert(!joinLines.exists(l => l.contains("Broadcast") && l.contains("salt")),
      s"the salted join must not broadcast:\n$plan")
  }

  test("dd_prefix_join is LOSSLESS: prefix-filtered pairs equal brute all-pairs Jaccard") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val sets = docs.select(col("doc_id"),
        graft.dedup.Dedup.shingles(col("text"), 3).as("shs"))
      .collect().map { r =>
        val keys = r.getSeq[String](1).map { sh =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(sh.getBytes("UTF-8")).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.take(15), 16)
        }
        r.getLong(0) -> keys
      }
    def fp4(x: Double) = math.floor(x * 1e4 + 0.5).toLong
    val expect = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = sa.toSet.intersect(sb.toSet).size.toLong
      un = sa.length + sb.length - inter
      j = fp4(inter.toDouble / un) if j >= 5000L
    } yield (a, b, inter, un, j)).toSet
    val out = SparkEntry.queries("dd_prefix_join")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out == expect, "prefix filtering lost or invented pairs")
    assert(out.nonEmpty)
    // and it genuinely filters: the candidate prefix join is far
    // smaller than all-pairs (the reduction IS the operator)
    val nCand = graft.dedup.Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .count() // just re-execute; the real reduction shows in the plan shape
    assert(nCand == out.size.toLong)
  }

  test("src_jsonl_corrupt quarantines malformed rows without losing good payloads") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy { case (id, lang) =>
      if (id % 7 == 0) "CORRUPT" else lang
    }.map { case (k, rs) =>
      val good = rs.filter(_._1 % 7 != 0)
      (k, rs.length.toLong, good.length.toLong, good.map(_._1).sum)
    }.toSet
    val df = SparkEntry.queries("src_jsonl_corrupt")(spark, TestSpark.Sf)
    // explain BEFORE collect: a finalized AQE plan prints Final+Initial
    // sections and double-counts every node
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val out = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expect, "quarantine counts + id checksums")
    assert(out.exists(_._1 == "CORRUPT"), "corrupt bucket must exist")
    assert(out.filter(_._1 != "CORRUPT").forall(r => r._2 == r._3),
      "every good row must parse an id")
    // the parse is a narrow per-row map: exactly one exchange (the rollup)
    val n = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(n <= 2, s"parse must not shuffle (rollup + sort only):\n$plan")
  }

  test("ev_interarrival equals a brute log2-bucketed gap histogram") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val evs = raw.select(col("user_id"), col("event_id"),
        graft.queries.QueryUtil.tsMs(raw).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.map(e => (e._3, e._2)).sortBy(identity).toSeq
      sorted.zip(sorted.tail).map { case ((a, _), (b, _)) => b - a }
    }.toSeq
    val expect = gaps.groupBy { g =>
      if (g == 0) -1 else 63 - java.lang.Long.numberOfLeadingZeros(g)
    }.map { case (b, gs) => (b, gs.size.toLong, gs.min, gs.max) }.toSet
    val out = SparkEntry.queries("ev_interarrival")(spark, TestSpark.Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expect, "gap histogram")
    // buckets genuinely double: every bucket's range sits in [2^b, 2^(b+1))
    out.filter(_._1 >= 0).foreach { case (b, _, mn, mx) =>
      assert(mn >= (1L << b) && mx < (1L << (b + 1)), s"bucket $b out of range")
    }
    assert(out.size > 3, "non-degenerate histogram")
  }

  test("q29_cube covers all 4 grouping subsets consistently, via one Expand pass") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q29_cube")(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"CUBE must plan one Expand, not 2^k scans:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1, plan)
    val rows = df.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    // gid partitions the output into the 4 subsets; each subset's
    // total mass equals the grand total
    val byGid = rows.groupBy(_._5)
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L), byGid.keySet.toString)
    val grand = byGid(3L)
    assert(grand.length == 1 && grand.head._1.isEmpty && grand.head._2.isEmpty)
    byGid.values.foreach { g =>
      assert(g.map(_._3).sum == grand.head._3, "row mass per subset")
      assert(g.map(_._4).sum == grand.head._4, "qty mass per subset")
    }
  }

  test("pipe_dataset_card equals a brute per-source profile") {
    import org.apache.spark.sql.functions._
    val rows = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "source", "lang", "n_chars", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
    val hashCount = rows.groupBy(r => java.security.MessageDigest.getInstance("MD5")
      .digest(r._5.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .view.mapValues(_.length).toMap
    def md5h(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = rows.groupBy(_._2).map { case (src, rs) =>
      val n = rs.length.toLong
      val toks = rs.map(_._5.toLowerCase.split("\\s+").count(_.nonEmpty).toLong).sum
      val dups = rs.count(r => hashCount(md5h(r._5)) > 1).toLong
      val lens = rs.map(_._4).sorted
      val p50 = lens((((n + 1) / 2) - 1).toInt) // smallest value with cum >= (n+1)/2
      val top = rs.groupBy(_._3).view.mapValues(_.length).toSeq
        .sortBy { case (l, c) => (-c, l) }.head
      (src, n, toks, dups, math.floor(dups.toDouble / n * 1e4 + 0.5).toLong,
        top._1, top._2.toLong, p50,
        math.floor(rs.map(_._4).sum.toDouble / n * 1e2 + 0.5).toLong)
    }.toSet
    val got = SparkEntry.queries("pipe_dataset_card")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSet
    assert(got == expect, "dataset card rows")
    // the synthetic corpus has zero exact-dup texts (verified), so
    // exercise the dup-fraction path on a constructed table: 3 of 4
    // docs in src a share a text (one re-hosted from src b → both
    // count as duplicated, cross-source)
    val tmp = java.nio.file.Files.createTempDirectory("graft_card").toString
    import spark.implicits._
    Seq((1L, "a", "en", 5L, "same text"), (2L, "a", "en", 5L, "same text"),
        (3L, "a", "en", 9L, "unique one"), (4L, "b", "de", 5L, "same text"))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val card = SparkEntry.queries("pipe_dataset_card")(spark, tmp)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(card("a") == ((2L, 6667L)), s"src a dup fraction: ${card("a")}")
    assert(card("b") == ((1L, 10000L)), s"src b re-hosted copy must count: ${card("b")}")
    new java.io.File(tmp).listFiles().foreach(_ => ())
  }

  test("txt_langid_eval equals the rollup of the two verified langid outputs") {
    import org.apache.spark.sql.functions._
    val truth = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ps = SparkEntry.queries("txt_langid")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pg = SparkEntry.queries("txt_langid_ngram")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def f4(n: Long, d: Long) = math.floor(n.toDouble / d * 1e4 + 0.5).toLong
    val expect = truth.groupBy(_._2).map { case (lang, docs) =>
      val ids = docs.keys.toSeq
      val n = ids.size.toLong
      val ns = ids.count(i => ps(i) == lang).toLong
      val ng = ids.count(i => pg(i) == lang).toLong
      val na = ids.count(i => ps(i) == pg(i)).toLong
      (lang, n, ns, ng, na, f4(ns, n), f4(ng, n), f4(na, n))
    }.toSet
    val got = SparkEntry.queries("txt_langid_eval")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expect, "per-language eval rollup")
    assert(got.map(_._2).sum == truth.size, "cells partition the corpus")
  }

  test("ev_rolling_distinct equals a brute trailing-7-day distinct scan") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val du = raw.select(col("user_id"), graft.queries.QueryUtil.tsMs(raw).as("ms"))
      .collect().map(r => (r.getLong(1) / 86400000L, r.getLong(0))).distinct
    val days = du.map(_._1).distinct
    val expect = days.map { d =>
      val dau = du.count(_._1 == d).toLong
      val wau = du.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).distinct.size.toLong
      (d, dau, wau, math.floor(dau.toDouble / wau * 10000 + 0.5).toLong)
    }.toSet
    val out = SparkEntry.queries("ev_rolling_distinct")(spark, TestSpark.Sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"rolling distinct must stay an equi-join plan:\n$plan")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect, "rolling DAU/WAU7")
    // WAU dominates DAU, and the window genuinely widens it somewhere
    got.foreach { case (_, dau, wau, _) => assert(wau >= dau) }
    assert(got.exists { case (_, dau, wau, _) => wau > dau }, "window never widened")
  }

  test("ev_gaps_islands equals a brute consecutive-run scan") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val hrs = raw.select(col("event_type"),
        (graft.queries.QueryUtil.tsMs(raw) / 3600000).cast("long").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, hs) => t -> hs.map(_._2).distinct.sorted.toSeq }
    val expect = hrs.map { case (t, hs) =>
      val runs = hs.foldLeft(List.empty[(Long, Long)]) { // (start, len) runs
        case (Nil, h) => List((h, 1L))
        case ((s0, l) :: rest, h) if h == s0 + l => (s0, l + 1) :: rest
        case (acc, h) => (h, 1L) :: acc
      }
      val gaps = hs.zip(hs.tail).map { case (a, b) => b - a - 1 }
      (t, hs.length.toLong, runs.length.toLong, runs.map(_._2).max,
        if (gaps.isEmpty) 0L else math.max(gaps.max, 0L))
    }.toSet
    val out = SparkEntry.queries("ev_gaps_islands")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out == expect, "islands vs brute runs")
    assert(out.exists(_._3 > 1), "at least one type has multiple islands")
    assert(out.exists(_._5 > 0), "at least one real gap")
  }

  test("ev_kmv_merge: day-partitioned bottom-k sketches union-merge into the corpus sketch") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val rows = raw.select(col("event_type"),
        (graft.queries.QueryUtil.tsMs(raw) / 86400000).cast("long").as("day"),
        graft.sample.Sampling.hashUniform(col("user_id"), "kmv").as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val k = 64
    val expect = rows.groupBy(_._1).map { case (t, es) =>
      // per-day bottom-k, unioned, re-bottomed — the merge path
      val dayK = es.groupBy(_._2).values.flatMap(_.map(_._3).distinct.sorted.take(k))
      val mergedK = dayK.toSeq.distinct.sorted.take(k)
      // direct corpus bottom-k
      val directK = es.map(_._3).distinct.sorted.take(k).toSeq
      assert(mergedK == directK, s"union-merge law broke for $t")
      def est(s: Seq[Double]) =
        if (s.length < k) s.length.toDouble else (k - 1).toDouble / s.last
      (t, es.map(_._2).distinct.length.toLong, directK.length.toLong,
        math.floor(est(directK) * 100 + 0.5).toLong, mergedK.length.toLong,
        math.floor(est(mergedK) * 100 + 0.5).toLong)
    }.toSet
    val out = SparkEntry.queries("ev_kmv_merge")(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(out == expect, "kmv merge vs brute")
    // estimates stay within the ~1/sqrt(k) band of the exact count
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._3).distinct.length).toMap
    out.foreach { case (t, _, nk, estFp2, _, _) =>
      if (nk == k) {
        val e = estFp2 / 100.0
        assert(math.abs(e - exact(t)) / exact(t) < 0.5, s"$t estimate off: $e vs ${exact(t)}")
      }
    }
  }

  test("ev_decay_score equals a brute half-life recompute with exact 2^-k weights") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val rows = raw.select(col("user_id"),
        (graft.queries.QueryUtil.tsMs(raw) / 86400000).cast("long").as("day"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1e4 + 0.5).toLong))
    val maxDay = rows.map(_._2).max
    val expect = rows.groupBy(_._1).map { case (u, es) =>
      val s6 = es.map { case (_, d, v4) =>
        val k = math.min((maxDay - d) / 7, 40L).toInt
        math.floor(v4.toDouble / 1e4 / (1L << k).toDouble * 1e6 + 0.5).toLong
      }.sum
      (u, es.length.toLong, s6)
    }.toSet
    val df = SparkEntry.queries("ev_decay_score")(spark, TestSpark.Sf)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expect, "decayed scores")
    // decay really differentiates ages: not all weights were 1
    val flat = rows.groupBy(_._1).map { case (u, es) =>
      (u, es.length.toLong, es.map(e => math.floor(e._3.toDouble / 1e4 * 1e6 + 0.5).toLong).sum)
    }.toSet
    assert(out != flat, "scores must differ from undecayed sums")
  }

  test("ev_bitmap_retention popcounts equal plain set intersection semantics") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val byDay = raw.select(
        (graft.queries.QueryUtil.tsMs(raw) / 86400000).cast("long").as("day"),
        col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, us) => d -> us.map(_._2).toSet }
    val expect = byDay.map { case (d, users) =>
      (d, users.size.toLong,
        byDay.get(d + 7).map(n => (users & n).size.toLong).getOrElse(0L))
    }.toSet
    val df = SparkEntry.queries("ev_bitmap_retention")(spark, TestSpark.Sf)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expect, "bitmap popcounts vs set semantics")
    assert(out.exists(_._3 > 0), "some 7-day retention is nonzero")
    // the intersection never re-touches raw events: the index frame is
    // checkpointed once and both join sides read it
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("FileScan"), s"join must probe the index, not rescan events:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortAggregate"), plan)
  }

  test("src_zorder equals a brute Morton recompute; z-buckets bound BOTH dims") {
    import org.apache.spark.sql.functions._
    def spread(v0: Long): Long = {
      var v = v0 & 4095L
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    val pts = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0) * 2654435761L % 4096, r.getLong(1) * 2246822519L % 4096))
    val expect = pts.flatMap { case (x, y) =>
      Seq(("zorder", (spread(x) | (spread(y) << 1)) >> 16, x, y),
        ("linear", x >> 4, x, y))
    }.groupBy(p => (p._1, p._2)).map { case ((lay, b), ps) =>
      (lay, b, ps.length.toLong,
        ps.map(_._3).min, ps.map(_._3).max, ps.map(_._4).min, ps.map(_._4).max)
    }.toSet
    val df = SparkEntry.queries("src_zorder")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val out = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSet == expect, "manifest stats")
    // the z-order guarantee: every bucket's bounding box is a ≤256-
    // wide tile on BOTH dimensions (high interleaved bits fix the
    // high 4 bits of each dim); the linear layout can't bound y
    val zo = out.filter(_._1 == "zorder")
    assert(zo.nonEmpty && zo.forall(b => b._5 - b._4 <= 255 && b._7 - b._6 <= 255),
      "z tile bound violated")
    val lin = out.filter(_._1 == "linear")
    assert(lin.exists(b => b._7 - b._6 > 1024), "linear y-span should be unbounded")
    // one corpus scan feeds both layouts (the 2-row explode, not a union of scans)
    assert(plan.sliding("FileScan parquet".length).count(_ == "FileScan parquet") == 1,
      s"both layouts must share one scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortAggregate"), plan)
  }

  test("src_ivm: delta-maintained aggregate equals the recomputed view, retractions fire") {
    import org.apache.spark.sql.functions._
    def cents(d: Double) = math.floor(d * 100 + 0.5).toLong
    val base = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), cents(r.getDouble(2))))).toMap
    val chg = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice").collect()
      .map { r =>
        val ln = r.getInt(1)
        val key = if (ln % 3 == 2) r.getLong(0) + 600000000L else r.getLong(0)
        key -> (((ln.toLong * 34359738368L + cents(r.getDouble(3))) * 4 +
          ln % 3) * 4 + "ANR".indexOf(r.getString(2)))
      }
    val latest = chg.groupBy(_._1).map { case (k, cs) =>
      val p = cs.map(_._2).max
      k -> (("DUI" ((p / 4 % 4).toInt), "ANR" ((p % 4).toInt).toString,
        p / 16 % 34359738368L))
    }
    // brute recompute over the merged snapshot
    val merged = (base.keySet ++ latest.keySet).toSeq.flatMap { k =>
      latest.get(k) match {
        case Some(('D', _, _)) => None
        case Some((_, st, tc)) => Some((st, tc))
        case None => base.get(k).map { case (st, tc) => (st, tc) }
      }
    }
    val view = merged.groupBy(_._1).map { case (st, rs) =>
      (st, rs.length.toLong, rs.map(_._2).sum)
    }.toSet
    val out = SparkEntry.queries("src_ivm")(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the LAW: both paths equal the brute view, no nulls from the
    // full-outer (a spurious/missing group would surface as null)
    assert(out.map(r => (r._1, r._2, r._3)).toSet == view, "maintained path")
    assert(out.map(r => (r._1, r._4, r._5)).toSet == view, "recomputed path")
    // retractions genuinely fired: every base status group SHRANK
    val baseCounts = base.values.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    baseCounts.foreach { case (st, n0) =>
      val now = out.find(_._1 == st).map(_._2).getOrElse(0L)
      assert(now < n0, s"status $st never lost a row — retraction path untested")
    }
    // and additions landed in changelog-only statuses
    assert(out.exists(r => !baseCounts.contains(r._1)), "no inserted status groups")
  }

  test("src_scd2 equals a brute version history and reuses one key shuffle") {
    import org.apache.spark.sql.functions._
    def cents(d: Double) = math.floor(d * 100 + 0.5).toLong
    val chg = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice").collect()
      .map { r =>
        val ln = r.getInt(1)
        val key = if (ln % 3 == 2) r.getLong(0) + 600000000L else r.getLong(0)
        key -> (((ln.toLong * 34359738368L + cents(r.getDouble(3))) * 4 +
          ln % 3) * 4 + "ANR".indexOf(r.getString(2)))
      }.distinct
    val expect = chg.groupBy(_._1).toSeq.flatMap { case (k, cs) =>
      val ordered = cs.map(_._2).sorted.toSeq
      val iu = ordered.zipWithIndex.filter { case (p, _) => p / 4 % 4 != 0 }
      iu.zipWithIndex.map { case ((p, pos), i) =>
        (k, i + 1, "ANR"((p % 4).toInt).toString, p / 16 % 34359738368L,
          if (pos == ordered.length - 1) 1L else 0L)
      }
    }.toSet
    val df = SparkEntry.queries("src_scd2")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val out = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == expect, "version history")
    assert(out.exists(_._5 == 1L) && out.exists(_._5 == 0L), "both interval states")
    assert(out.exists(_._2 > 1), "multi-version keys exist")
    // lead + row_number share the (key, packed) partitioning: two
    // Window nodes but no extra exchange between them
    val nWindows = plan.sliding("Window".length).count(_ == "Window")
    val nExchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(nWindows >= 2, s"expected two window passes:\n$plan")
    assert(nExchanges <= 3, s"windows must share one key shuffle:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("CartesianProduct"), plan)
  }

  test("q22_unpivot matches a brute melt and plans an Expand, not three scans") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
    def cents(d: Double) = math.floor(d * 100 + 0.5).toLong
    val cols = Map(
      "quantity_c" -> li.map(r => cents(r.getDouble(0))),
      "extendedprice_c" -> li.map(r => cents(r.getDouble(1))),
      "discount_c" -> li.map(r => cents(r.getDouble(2))))
    val df = SparkEntry.queries("q22_unpivot")(spark, TestSpark.Sf)
    // explain BEFORE collect: a finalized AQE plan prints Final+Initial
    // sections and double-counts every node
    val planBefore = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val out = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == cols.keySet)
    cols.foreach { case (m, vs) =>
      assert(out(m) == ((vs.length.toLong, vs.sum, vs.min, vs.max)), s"measure $m")
    }
    assert(planBefore.contains("Expand"), s"unpivot must plan an Expand:\n$planBefore")
    assert(planBefore.sliding("FileScan parquet".length).count(_ == "FileScan parquet") == 1,
      "unpivot must read the table once, not per measure")
  }

  test("q23_correlated decorrelates to a join and matches a brute recount") {
    import org.apache.spark.sql.functions._
    val orders = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val byCust = orders.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expect = byCust.flatMap { case (ck, cs) =>
      val n = cs.length.toLong; val s = cs.sum
      val big = cs.count(c => 2 * c * n > 3 * s).toLong
      if (big > 0) Some(ck -> big) else None
    }
    val df = SparkEntry.queries("q23_correlated")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // decorrelation: the scalar subqueries must become aggregate+join,
    // never a per-row subquery execution
    assert(plan.contains("Join"), s"expected a decorrelated join:\n$plan")
    assert(!plan.contains("Subquery"), s"subquery must not survive to execution:\n$plan")
    val out = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expect, "per-customer big-order counts")
    assert(out.nonEmpty)
  }

  test("q24_lateral plans a partial WindowGroupLimit and matches a brute top-3") {
    val orders = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val expect = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      os.sortBy(o => (-o._3, o._2)).take(3).map(o => (ck, o._2, o._3))
    }.toSet
    val df = SparkEntry.queries("q24_lateral")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // the lateral must decorrelate into a rank-pushdown group limit —
    // tasks forward ≤3 rows per key BEFORE the exchange, so the
    // shuffle never carries a customer's full order history
    assert(plan.contains("WindowGroupLimit"), s"expected rank pushdown:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"lateral must not plan a cross product:\n$plan")
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expect, "top-3 orders per customer")
    assert(out.nonEmpty)
  }

  test("q25_range_frame equals a brute trailing-30-day recompute") {
    import org.apache.spark.sql.functions._
    def cents(d: Double) = math.floor(d * 100 + 0.5).toLong
    val orders = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000").as("day"),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), cents(r.getDouble(3))))
    val expect = orders.groupBy(_._1).toSeq.flatMap { case (_, os) =>
      os.map { case (ck, ok, day, c) =>
        val in = os.filter(o => o._3 >= day - 30 && o._3 <= day)
        (ck, ok, day, c, in.map(_._4).sum, in.length.toLong)
      }
    }.toSet
    val df = SparkEntry.queries("q25_range_frame")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val out = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out == expect, "trailing-30-day frame")
    assert(out.exists(_._6 > 1), "some frame holds >1 order")
    // a RANGE (value-bounded) frame, evaluated in one specified-window
    // pass — not a rows frame, not a self-join
    assert(plan.contains("specifiedwindowframe(RangeFrame"), s"expected RANGE frame:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"), plan)
  }

  test("dd_bloom_state equals a brute bit recount; shard OR-merge equals direct") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select(col("source"), md5(col("text")).as("h")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def u32mod(salt: String, h: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + h).getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1024L
    }
    val bySource = docs.groupBy(_._1).view.mapValues(_.flatMap { case (_, h) =>
      (0 until 4).map(j => u32mod(s"bf$j:", h)) }.toSet).toMap
    val out = SparkEntry.queries("dd_bloom_state")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet == bySource.keySet)
    out.foreach { case (src, (bits, posSum, fill, bitsM, posSumM)) =>
      val expect = bySource(src)
      assert(bits == expect.size.toLong, s"$src bits_set")
      assert(posSum == expect.sum, s"$src pos_sum")
      assert(fill == math.floor(expect.size.toDouble / 1024.0 * 1e4 + 0.5).toLong, s"$src fill")
      assert(bitsM == bits && posSumM == posSum, s"$src shard merge must equal direct")
    }
  }

  test("src_partitioned_scan: the partition filter prunes to one directory") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("src_partitioned_scan")(spark, TestSpark.Sf)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter must reach the scan:\n$plan")
    // values match an unpartitioned recount
    val raw = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val expect = raw.filter(col("event_type") === "purchase")
      .select((graft.queries.QueryUtil.tsMs(raw) / 86400000).cast("long").as("day"),
        graft.text.TextAnalysis.fp(col("value"), 4).as("v4"))
      .groupBy("day").agg(count(lit(1)).as("n"), sum("v4").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val out = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == expect, "partitioned readback must equal the unpartitioned recount")
  }

  test("ev_hll_merge: day-partitioned registers merge to the one-shot sketch") {
    val rows = SparkEntry.queries("ev_hll_merge")(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, nDays, regSum, estM, regSumD, estD) =>
      assert(nDays >= 1, s"$et n_days")
      assert(regSum == regSumD, s"$et merged register sum must equal the one-shot build")
      assert(estM == estD, s"$et merged estimate must equal the one-shot estimate")
    }
  }

  test("emb_pca_power equals a brute BigInt power iteration and is near-eigen") {
    import org.apache.spark.sql.functions._
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => BigInt(math.floor(x.toDouble * 1e6 + 0.5).toLong)).toArray)
    val d = vecs.head.length
    val n = BigInt(vecs.length)
    val s = Array.ofDim[BigInt](d, d); val m = Array.fill(d)(BigInt(0))
    for (i <- 0 until d; j <- 0 until d) s(i)(j) = BigInt(0)
    vecs.foreach { v =>
      for (i <- 0 until d) { m(i) += v(i); for (j <- 0 until d) s(i)(j) += v(i) * v(j) }
    }
    val cov = Array.tabulate(d, d)((i, j) => n * s(i)(j) - m(i) * m(j))
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 1 to 4) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = if (mx == 0) Array.fill(d)(BigInt(1000000))
        else w.map(wi => BigInt(math.floor(wi.toDouble / mx.toDouble * 1e6 + 0.5).toLong))
    }
    val out = SparkEntry.queries("emb_pca_power")(spark, TestSpark.Sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.size == d)
    (0 until d).foreach(i => assert(out(i) == v(i).toLong, s"dim $i"))
    // eigen sanity: C·v stays aligned with v (cosine ≥ 0.99 after 4 iters)
    val vd = v.map(_.toDouble)
    val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j).toDouble * vd(j)).sum)
    val cos = (0 until d).map(i => cv(i) * vd(i)).sum /
      (math.sqrt(cv.map(x => x * x).sum) * math.sqrt(vd.map(x => x * x).sum))
    assert(cos > 0.99, s"cosine(C*v, v) = $cos")
  }

  test("emb_pq_distortion equals the rollup of the verified encode and bounds hold") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val cb = graft.similarity.Similarity.pqCodebook(e, "vec_id", "embedding", 64, 4, 16)
    val enc = graft.similarity.Similarity.pqEncode(e, "vec_id", "embedding", cb)
      .select("sub", "d2_fp6").collect().map(r => (r.getInt(0), r.getLong(1)))
    val expect = enc.groupBy(_._1).map { case (s, ds) =>
      (s, ds.length.toLong, ds.map(_._2).sum, ds.map(_._2).max)
    }.toSet
    val out = SparkEntry.queries("emb_pq_distortion")(spark, TestSpark.Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expect, "distortion rollup")
    assert(out.size == 4 && out.forall(_._3 > 0), "4 subspaces, nonzero distortion")
    // d2 is a squared distance: never negative
    assert(enc.forall(_._2 >= 0), "negative squared distortion")
  }

  test("smp_balance keeps exactly min-class-size rows per label, identity-checked") {
    import org.apache.spark.sql.functions._
    val rows = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id", "label").collect().map(r => (r.getLong(0), r.getInt(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(s"bal:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16).toDouble / 4294967296.0
    }
    val byLabel = rows.groupBy(_._2)
    val k = byLabel.values.map(_.length).min
    val expect = byLabel.map { case (lab, vs) =>
      val kept = vs.map(v => (u(v._1), v._1)).sortBy(identity).take(k)
      (lab, k.toLong, kept.map(_._2).sum,
        math.floor(kept.map(_._1).max * 1e6 + 0.5).toLong)
    }.toSet
    val out = SparkEntry.queries("smp_balance")(spark, TestSpark.Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expect, "balanced selection identity")
    assert(out.map(_._2).toSet.size == 1, "every label kept the same count")
    // the rule actually balanced: some class was LARGER than k
    assert(byLabel.values.exists(_.length > k), "no imbalance to correct at this SF")
  }

  test("emb_class_sep equals a brute within/between scatter recompute") {
    import org.apache.spark.sql.functions._
    val rows = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
    val d = rows.head._2.length
    val byLabel = rows.groupBy(_._1)
    def centOf(vs: Iterable[Array[Long]]): Array[Long] = {
      val n = vs.size
      Array.tabulate(d)(i => math.floor(vs.map(_(i)).sum.toDouble / n + 0.5).toLong)
    }
    val gcent = {
      // global centroid from the PER-LABEL sums (same arithmetic path)
      val n = rows.length
      Array.tabulate(d)(i => math.floor(rows.map(_._2(i)).sum.toDouble / n + 0.5).toLong)
    }
    val expect = byLabel.map { case (lab, vs) =>
      val c = centOf(vs.map(_._2))
      val wss = vs.map(_._2).map(v =>
        (0 until d).map(i => BigInt(v(i) - c(i)) * BigInt(v(i) - c(i))).sum).sum
      val bss = (0 until d).map(i => (c(i) - gcent(i)) * (c(i) - gcent(i))).sum
      val msd = math.floor(
        wss.toDouble / vs.size / 64.0 / 1e12 * 1e4 + 0.5).toLong
      (lab, vs.size.toLong, msd, bss)
    }.toSet
    val out = SparkEntry.queries("emb_class_sep")(spark, TestSpark.Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == expect, "scatter stats")
    assert(out.map(_._1).size > 1, "multiple labels")
    assert(out.forall(_._4 > 0), "between-class distances nonzero")
  }

  test("emb_kmeans equals a brute Lloyd recompute and moves the centroids") {
    import org.apache.spark.sql.functions._
    val k = 8
    val rows = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
      .sortBy(_._1)
    val d = rows.head._2.length
    val seed = rows.take(k).map(_._2.clone)
    var cent = seed.map(_.clone)
    var lastGrid: Array[(Int, Int, Long, Long)] = null
    for (_ <- 1 to 2) {
      val assign = rows.map { case (_, v) =>
        (0 until k).map(c => ((0 until d).map(i => {
          val e = v(i) - cent(c)(i); e * e
        }).sum, c)).min._2 -> v
      }
      lastGrid = (0 until k).flatMap { c =>
        val mine = assign.filter(_._1 == c).map(_._2)
        (0 until d).map { i =>
          val cv = if (mine.isEmpty) cent(c)(i)
            else math.floor(mine.map(_(i)).sum.toDouble / mine.length + 0.5).toLong
          (c, i, mine.length.toLong, cv)
        }
      }.toArray
      cent = (0 until k).map(c =>
        (0 until d).map(i => lastGrid(c * d + i)._4).toArray).toArray
    }
    val df = SparkEntry.queries("emb_kmeans")(spark, TestSpark.Sf)
    // round 18 dropped the queries' presentation-only trailing sorts
    // (the driver's gate row-sorts before hashing) — order locally
    val out = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == lastGrid.toSeq, "final centroid grid")
    // the training actually moved every centroid off its seed vector
    (0 until k).foreach { c =>
      assert(!cent(c).sameElements(seed(c)), s"centroid $c never moved")
    }
    // every vector assigned exactly once; no empty cluster at this SF
    assert((0 until k).forall(c => out(c * d)._3 > 0), "empty cluster at test SF")
    assert(out.map(r => r._3).grouped(d).map(_.head).sum == rows.length)
    // scale shape: the assignment cross joins a BROADCAST centroid
    // frame — no shuffle of the corpus against the k-row side
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroids must broadcast:\n$plan")
  }

  test("emb_norm_stats equals a brute per-dimension recount") {
    import org.apache.spark.sql.functions._
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("embedding").collect().map(_.getSeq[Float](0))
    val out = SparkEntry.queries("emb_norm_stats")(spark, TestSpark.Sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == vecs.head.length)
    (0 until vecs.head.length).foreach { d =>
      val q6 = vecs.map(v => math.floor(v(d).toDouble * 1e6 + 0.5).toLong)
      val n = q6.length.toLong
      val s6 = q6.sum
      val ss12 = q6.map(q => BigInt(q) * BigInt(q)).sum
      val mean = s6.toDouble / 1e6 / n.toDouble
      val variance = ss12.toDouble / 1e12 / n.toDouble - mean * mean
      val (on, om, ov) = out(d)
      assert(on == n, s"dim $d n")
      assert(om == math.floor(mean * 1e6 + 0.5).toLong, s"dim $d mean")
      assert(ov == math.floor(variance * 1e6 + 0.5).toLong, s"dim $d var")
    }
  }
}
