package graft

import java.nio.file.{Files, Paths}

/** Dump the formatted physical plan of every registered query to
  * <outDir>/<name>.txt plus a one-line summary (exchanges, broadcasts,
  * codegen spans, scans) — the `.explain` audit loop SURVEY §4 calls
  * for. Usage: runMain graft.ExplainAudit <sfDir> <outDir>
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        def count(p: String) = plan.sliding(p.length).count(_ == p)
        f"$name%-22s exch=${count("Exchange")}%2d bcast=${count("BroadcastExchange")}%2d " +
          f"wsc=${count("WholeStageCodegen")}%2d scan=${count("Scan parquet")}%2d " +
          f"cart=${count("CartesianProduct")}%d sortagg=${count("SortAggregate")}%d"
      } catch { case e: Throwable => f"$name%-22s ERROR ${e.getMessage.take(60)}" }
    }
    rows.foreach(println)
    spark.stop()
  }
}
