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

  test("hex-EWKB geometry round-trips the partitioned JDBC read into a grid join, equal to the array path") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.WkbGeomExpr
    import graft.spatial.DWithinJoin
    // PostGIS wire shape: a snapshot table whose wkb_geometry column
    // is hex EWKB text — here a point lattice with a few malformed
    // cells, read back through the PARTITIONED jdbc contract and
    // decoded columnar inside each range partition
    def px(k: Long) = (k * 13 % 1000) / 10.0
    def py(k: Long) = (k * 29 % 1000) / 10.0
    val url = "jdbc:derby:memory:graftgeom;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE geosnap (id BIGINT PRIMARY KEY, wkb_geometry VARCHAR(200))")
      val ins = conn.prepareStatement("INSERT INTO geosnap VALUES (?, ?)")
      (0L to 99L).foreach { i =>
        ins.setLong(1, i)
        val hex =
          if (i % 37 == 3) "deadbeef" // malformed: must drop, not fail the scan
          else WkbGeomExpr.encode(1, Array((px(i), py(i))), srid = 4326)
            .map("%02x".format(_)).mkString
        ins.setString(2, hex); ins.addBatch()
      }
      ins.executeBatch()

      val decoded = Snapshots.decodeGeometry(
        Snapshots.jdbcReader(spark, url, "geosnap", "id", 0L, 100L, 4).load(),
        Seq("wkb_geometry"))
      assert(decoded.rdd.getNumPartitions == 4)
      val jdbcPts = decoded.filter(col("wkb_geometry").isNotNull)
        .select(col("id").as("lid"),
          col("wkb_geometry")(0).getField("x").as("lx"),
          col("wkb_geometry")(0).getField("y").as("ly"))
      assert(jdbcPts.count() == 97) // 3 malformed cells dropped (ids 3, 40, 77)

      // the array-geometry path computes the SAME lattice natively;
      // the probe side is shared, so any decode drift surfaces as a
      // grid-join diff
      val arrPts = spark.range(0, 100).filter(col("id") % 37 =!= 3)
        .select(col("id").as("lid"),
          ((col("id") * 13 % 1000) / 10.0).as("lx"),
          ((col("id") * 29 % 1000) / 10.0).as("ly"))
      val probe = spark.range(0, 40)
        .select((col("id") + 1000).as("rid"),
          ((col("id") * 13 % 1000) / 10.0 + 0.3).as("rx"),
          ((col("id") * 29 % 1000) / 10.0 - 0.2).as("ry"))
      def pairs(left: org.apache.spark.sql.DataFrame) =
        DWithinJoin.pointPoint(left, "lid", "lx", "ly", probe, "rid", "rx", "ry", 0.5)
          .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      val viaJdbc = pairs(jdbcPts)
      val viaArray = pairs(arrPts)
      assert(viaJdbc.nonEmpty, "grid join found no pairs — lattice/radius mismatch")
      assert(viaJdbc == viaArray, s"jdbc ${viaJdbc.size} pairs vs array ${viaArray.size}")
    } finally {
      try conn.createStatement().execute("DROP TABLE geosnap") finally conn.close()
    }
  }

  test("postgisTable round-trips WKB geometry + hstore tags through embedded JDBC") {
    import org.apache.spark.sql.functions.{col, element_at}
    import graft.functions.WkbGeomExpr
    // the reference's db.py input shape: id + geometry + hstore tag
    // text, with the awkward hstore corners present (escaped quote,
    // comma inside a value, duplicate key → last wins) and one
    // malformed geometry cell (must decode to NULL, not fail)
    val url = "jdbc:derby:memory:graftpgtable;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE snap (id BIGINT PRIMARY KEY, wkb_geometry VARCHAR(200), tags VARCHAR(400))")
      val ins = conn.prepareStatement("INSERT INTO snap VALUES (?, ?, ?)")
      (1L to 20L).foreach { i =>
        ins.setLong(1, i)
        val hex = WkbGeomExpr.encode(1, Array((i * 1.5, i * -0.5)), srid = 4326)
          .map("%02x".format(_)).mkString
        ins.setString(2, if (i == 13L) "feed" else hex)
        ins.setString(3,
          s""""name"=>"n\\"$i", "addr"=>"a, b$i", "k"=>"lost", "k"=>"kept$i"""")
        ins.addBatch()
      }
      ins.executeBatch()

      val df = Snapshots.postgisTable(spark, url, "snap",
        partitionColumn = Some("id"), lowerBound = 1L, upperBound = 21L,
        numPartitions = 4)
      assert(df.rdd.getNumPartitions == 4)
      val rows = df.select(col("id"),
          element_at(col("wkb_geometry"), 1).getField("x").as("x"),
          element_at(col("wkb_geometry"), 1).getField("y").as("y"),
          element_at(col("tags"), "name").as("name"),
          element_at(col("tags"), "addr").as("addr"),
          element_at(col("tags"), "k").as("k"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getDouble(2))),
            r.getString(3), r.getString(4), r.getString(5))).toMap
      assert(rows.size == 20)
      (1L to 20L).filter(_ != 13L).foreach { i =>
        val (geom, name, addr, k) = rows(i)
        assert(geom.contains((i * 1.5, i * -0.5)), s"row $i geometry: $geom")
        assert(name == "n\"" + i, s"row $i name: $name")   // escape unwound
        assert(addr == s"a, b$i", s"row $i addr: $addr")   // comma kept
        assert(k == s"kept$i", s"row $i k: $k")            // last key wins
      }
      // malformed geometry: dropped to NULL, tags still parse
      assert(rows(13L)._1.isEmpty && rows(13L)._4 == "kept13")
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
