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
}
