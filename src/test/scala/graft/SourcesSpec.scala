package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Snapshots

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("snapshot read pushes predicate and projection into the scan") {
    val df = Snapshots.read(spark, s"${TestSpark.Sf}/orders.parquet",
      columns = Seq("o_orderkey", "o_totalprice"), predicate = Some("o_totalprice > 100000"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(o_totalprice,100000"), plan)
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), plan)
    assert(df.count() > 0)
  }

  test("bucketed tables join without a shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      Snapshots.writeBucketed(
        spark.read.parquet(s"${TestSpark.Sf}/customer.parquet"), "c_bucketed", "c_custkey", 4, Some("c_custkey"))
      Snapshots.writeBucketed(
        spark.read.parquet(s"${TestSpark.Sf}/orders.parquet"), "o_bucketed", "o_custkey", 4, Some("o_custkey"))
      val joined = spark.table("c_bucketed")
        .join(spark.table("o_bucketed"), spark.table("c_bucketed")("c_custkey") === spark.table("o_bucketed")("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS c_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
