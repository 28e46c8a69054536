package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only profiling harness (not part of the bench/verify contract):
  * runs ONE registered query with a job listener and per-phase timing,
  * so "where do the seconds go" is answerable without the UI.
  * Usage: runMain graft.tools.ProfilePipeline <sfDir> <query> [runs]
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = args.lift(1).getOrElse("cg_pipeline_counts")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(graft.functions.GraftFunctions.register)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, String, Long)]()
    val starts = scala.collection.mutable.Map[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = ("stages=" + js.stageInfos.size + " " +
          js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ").take(180), System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (d, t0) =>
          jobs += ((je.jobId, d, System.nanoTime() - t0))
        }
    })
    val fn = graft.SparkEntry.queries(qname)
    (1 to runs).foreach { r =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      jobs.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tCons = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tEnd = System.nanoTime()
      Thread.sleep(300) // let listener drain
      println(f"== run $r: construct=${(tCons - t0) / 1e9}%.2f s write=${(tEnd - tCons) / 1e9}%.2f s total=${(tEnd - t0) / 1e9}%.2f s, ${jobs.size} jobs")
      jobs.sortBy(_._1).foreach { case (id, d, ns) =>
        println(f"  job $id%3d ${ns / 1e9}%6.3f s  $d")
      }
    }
    spark.stop()
  }
}
