package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times a noop-format write of every registered
  * query (materializes EVERY output column — `count()` would let
  * Catalyst prune projected expressions and under-time map-only
  * queries).
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 2) inside
  * one JVM and the emitted per-query number is the MIN — this VM's
  * measured noise band is 3-6× per query on a bad tail, so a single
  * run can misstate the repo's cost by 2× (seen in round 2). The raw
  * runs are emitted alongside under "runs".
  *
  * Failures are never silent: a crashing query records -1 in
  * "queries" and its exception under "errors" instead of an
  * ordinary-looking wall time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(graft.functions.GraftFunctions.register)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/scheduler and file-footer reads
    // (best-effort — a missing table must not kill the bench run)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings", "events")
      .foreach(t => try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () })
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val runs = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
            -1.0
        }
      }
      name -> runs
    }
    val qs = results.map { case (k, runs) =>
      val v = if (runs.contains(-1.0)) -1.0 else runs.min
      s"\"$k\":$v"
    }.mkString("{", ",", "}")
    val runsJson = results.map { case (k, runs) =>
      s"\"$k\":[${runs.mkString(",")}]"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) =>
      "\"" + k + "\":\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val mins = results.values.collect { case r if !r.contains(-1.0) => r.min }
    val total = if (mins.nonEmpty) mins.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"errors":$errJson,"n_runs":$nRuns,"sf":"$sfDir"}""")
    spark.stop()
  }
}
