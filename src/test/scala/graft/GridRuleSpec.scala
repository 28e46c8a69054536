package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.spatial.{DWithinJoin, Geo}

/** GridDWithinJoinRule: the declarative `graft_dwithin` θ-join must be
  * rewritten into a grid equi-join (no nested-loop/cartesian plan) and
  * produce exactly the rows of the hand-built DWithinJoin operator.
  */
class GridRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pts(n: Int, salt: Long) =
    (0 until n).map { i => (i.toLong + salt * 100000, (i * 13 % 97).toDouble / 3.0, (i * 29 % 89).toDouble / 3.0) }

  private def leftDf = pts(400, 0).toDF("lid", "lx", "ly")
  private def rightDf = pts(300, 1).toDF("rid", "rx", "ry")

  test("naive graft_dwithin join rewrites to an equi-join plan (no nested loop, no cartesian)") {
    val joined = leftDf.join(rightDf, expr("graft_dwithin(lx, ly, rx, ry, 1.5D)"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
      s"dwithin join must not plan a nested loop:\n$physical")
    assert(physical.contains("Generate explode"), "left side must replicate to neighbor cells")
  }

  test("rewritten join returns exactly the hand-built grid join's rows") {
    val viaRule = leftDf.join(rightDf, expr("graft_dwithin(lx, ly, rx, ry, 1.5D)"))
      .select(col("lid"), col("rid"))
      .as[(Long, Long)].collect().toSet
    val viaOperator = DWithinJoin.pointPoint(
        leftDf, "lid", "lx", "ly", rightDf, "rid", "rx", "ry", 1.5)
      .select(col("lid"), col("rid"))
      .as[(Long, Long)].collect().toSet
    assert(viaRule == viaOperator)
    assert(viaRule.nonEmpty, "test geometry must produce matches")
  }

  test("cross-join-then-filter formulation also rewrites (filter pushes into the join first)") {
    val filtered = leftDf.crossJoin(rightDf)
      .filter(expr("graft_dwithin(lx, ly, rx, ry, 1.5D)"))
    val physical = filtered.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
      s"filter-into-join then grid rewrite must both fire:\n$physical")
  }

  test("extra conjuncts survive the rewrite as join filters") {
    val out = leftDf.join(rightDf,
        expr("graft_dwithin(lx, ly, rx, ry, 1.5D)") && col("lid") % 2 === 0)
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._1 % 2 == 0))
  }

  test("rule leaves ineligible joins alone; the marker still evaluates correctly") {
    // non-foldable radius: no rewrite, falls back to nested loop but stays CORRECT
    val dynRadius = leftDf.join(rightDf,
        expr("graft_dwithin(lx, ly, rx, ry, cast(1 + rid % 1 AS DOUBLE) * 1.5D)"))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    val reference = DWithinJoin.pointPoint(
        leftDf, "lid", "lx", "ly", rightDf, "rid", "rx", "ry", 1.5)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(dynRadius == reference, "unrewritten marker must still compute st_dwithin")
    // marker as a plain scalar filter (no join): plain predicate semantics
    val scalar = leftDf.filter(expr("graft_dwithin(lx, ly, 10.0D, 10.0D, 3.0D)"))
      .select("lid").as[Long].collect().toSet
    val expected = leftDf.filter(Geo.dist(col("lx"), col("ly"), lit(10.0), lit(10.0)) <= 3.0)
      .select("lid").as[Long].collect().toSet
    assert(scalar == expected && scalar.nonEmpty)
  }
}
