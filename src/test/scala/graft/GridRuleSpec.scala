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

  test("9-cell replication lands on the SMALLER side (cost-based, via logical stats)") {
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val big = pts(5000, 0).toDF("lid", "lx", "ly")
    val small = pts(40, 1).toDF("rid", "rx", "ry")
    def generateChildCols(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
      assert(gens.length == 1, "exactly one cell explode expected")
      gens.head.child.output.map(_.name).toSet
    }
    // small side on the right -> right gets replicated
    val c1 = generateChildCols(big.join(small, expr("graft_dwithin(lx, ly, rx, ry, 1.5D)")))
    assert(c1.contains("rid") && !c1.contains("lid"), s"explode should sit on the small side: $c1")
    // small side on the left -> left gets replicated
    val c2 = generateChildCols(small.join(big, expr("graft_dwithin(rx, ry, lx, ly, 1.5D)")))
    assert(c2.contains("rid") && !c2.contains("lid"), s"explode should follow the small side: $c2")
    // results identical either way
    val r1 = big.join(small, expr("graft_dwithin(lx, ly, rx, ry, 1.5D)"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val r2 = small.join(big, expr("graft_dwithin(rx, ry, lx, ly, 1.5D)"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(r1 == r2 && r1.nonEmpty)
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
