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

  test("jdbcReader covers the table exactly once across partitioned ranges (embedded Derby)") {
    // Derby ships on the Spark classpath (Hive metastore backend), so
    // the partitioned-read contract is provable without a network DB
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE snap (id BIGINT PRIMARY KEY, val VARCHAR(20))")
      val ins = conn.prepareStatement("INSERT INTO snap VALUES (?, ?)")
      // ids deliberately OUTSIDE [lowerBound, upperBound) too: Spark's
      // first/last stride is unbounded, so nothing may be lost or doubled
      (-5L to 104L).foreach { i => ins.setLong(1, i); ins.setString(2, s"v$i"); ins.addBatch() }
      ins.executeBatch()

      val df = Snapshots.jdbcReader(spark, url, "snap", "id",
        lowerBound = 0L, upperBound = 100L, numPartitions = 7).load()
      assert(df.rdd.getNumPartitions == 7, s"got ${df.rdd.getNumPartitions} partitions")
      import spark.implicits._
      val ids = df.select("id").as[Long].collect().sorted.toSeq
      // exactly once: no range gap, no range overlap, strays included
      assert(ids == (-5L to 104L).toSeq)
    } finally {
      try conn.createStatement().execute("DROP TABLE snap") finally conn.close()
    }
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
