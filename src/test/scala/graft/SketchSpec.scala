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
}
