package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.Sketches

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kmvDistinct: error within the 1/sqrt(k) band, exact under k, partitioning-stable") {
    // 10k distinct values spread over 3 groups plus one tiny group
    val rows = (1L to 30000L).map(i => (s"g${i % 3}", i % 10000)) ++
      (1L to 5L).map(i => ("tiny", i))
    val df = rows.toDF("grp", "v")
    val out = Sketches.kmvDistinct(df, Seq("grp"), "v", k = 256)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // big groups: ~3334 distinct values each; 2/sqrt(256) = 12.5% bar
    // (double the one-sigma band — deterministic data, fixed outcome)
    Seq("g0", "g1", "g2").foreach { g =>
      val (kept, estFp2) = out(g)
      assert(kept == 256)
      val truth = rows.filter(_._1 == g).map(_._2).distinct.size
      val est = estFp2 / 100.0
      assert(math.abs(est - truth) / truth < 0.125, s"$g: est $est truth $truth")
    }
    // under k distinct → exact count, no estimation
    assert(out("tiny") == ((5L, 500L)))
    // pure function of the data: physical partitioning cannot move it
    val out13 = Sketches.kmvDistinct(df.repartition(13), Seq("grp"), "v", k = 256)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out13 == out)
  }

  test("hllDistinct: error band, linear-counting small range, dup-insensitive, partitioning-stable") {
    // one 8k-distinct group, one 300-distinct group, one tiny group
    val rows = (1L to 24000L).map(i => ("big", i % 8000)) ++
      (1L to 900L).map(i => ("mid", i % 300)) ++
      (1L to 12L).map(i => ("tiny", i % 6))
    val df = rows.toDF("grp", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllDistinct(d, Seq("grp"), "v", p = 8)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val out = run(df)
    // m=256 → σ ≈ 1.04/16 = 6.5%; allow 3σ on deterministic data
    val estBig = out("big")._3 / 100.0
    assert(math.abs(estBig - 8000) / 8000.0 < 0.195, s"big: $estBig")
    // 300 distinct over 256 registers leaves empties → linear counting,
    // which is tight at this load factor
    val estMid = out("mid")._3 / 100.0
    assert(out("mid")._1 > 0, "mid must keep empty registers")
    assert(math.abs(estMid - 300) / 300.0 < 0.15, s"mid: $estMid")
    // near-empty sketch: estimate ~exact
    val estTiny = out("tiny")._3 / 100.0
    assert(math.abs(estTiny - 6) < 1.0, s"tiny: $estTiny")
    // registers are max-merged: duplicating every row changes NOTHING
    assert(run(df.union(df)) == out)
    // pure function of the data
    assert(run(df.repartition(13)) == out)
    // register-sum sanity: Σ 2^(25−M_b) ≤ m·2^25, ≥ m (all-saturated)
    out.values.foreach { case (vz, regSum, _) =>
      assert(regSum >= 256L && regSum <= 256L * (1L << 25))
      assert(vz >= 0 && vz <= 256)
    }
  }

  test("cmsFreq: estimate is an upper bound, tight without collisions, partitioning-stable") {
    // 5 keys with very different frequencies over a 4x64 sketch —
    // collisions among 5 keys are unlikely per row, and min-over-4
    // rows kills any single-row collision
    val rows = Seq.tabulate(5)(k => s"key$k").zipWithIndex
      .flatMap { case (k, i) => Seq.fill((i + 1) * 100)(k) }
    val df = rows.toDF("k")
    val out = Sketches.cmsFreq(df, "k", d = 4, w = 64)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set("key0", "key1", "key2", "key3", "key4"))
    out.foreach { case (k, (exact, est)) =>
      assert(est >= exact, s"$k: CMS must never under-count")
      assert(exact == (k.last - '0' + 1) * 100L)
    }
    // 5 keys / 64 buckets / 4 independent rows: exact here
    assert(out.forall { case (_, (exact, est)) => est == exact })
    // sketch is a pure function of the data
    val out7 = Sketches.cmsFreq(df.repartition(7), "k", d = 4, w = 64)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out7 == out)
    // forced collisions: w = 2 crams 5 keys into 2 buckets per row —
    // estimates must overshoot yet stay bounded by the total count
    val squeezed = Sketches.cmsFreq(df, "k", d = 2, w = 2)
      .as[(String, Long, Long)].collect()
    val total = rows.size
    squeezed.foreach { case (k, exact, est) =>
      assert(est >= exact && est <= total, s"$k: $est outside [$exact, $total]")
    }
  }
}
