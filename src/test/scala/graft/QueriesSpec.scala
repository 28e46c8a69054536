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
      if (n == 0 && name != "q8_antijoin") empties += name // anti-join may legitimately be empty
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

  test("no registered query plans a cartesian product") {
    val offenders = SparkEntry.queries.keys.filter { name =>
      val plan = SparkEntry.queries(name)(spark, TestSpark.Sf).queryExecution.executedPlan.toString
      plan.contains("CartesianProduct")
    }
    // sim_topk broadcasts a 1-row literal — BroadcastNestedLoopJoin is fine,
    // CartesianProduct is not.
    assert(offenders.isEmpty, s"cartesian in: $offenders")
  }

  test("q5 top-N avoids a global sort") {
    val plan = SparkEntry.queries("q5_sort_limit")(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
