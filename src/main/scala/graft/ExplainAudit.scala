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
        Files.writeString(Paths.get(s"$outDir/$name.txt"),
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
        // Count in SimpleMode output: nodes print inline there
        // ("+- Exchange hashpartitioning(...)"), whereas FormattedMode splits
        // the node name from its Arguments: line and the pattern never matches.
        val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
        def count(p: String) = plan.sliding(p.length).count(_ == p)
        // shuffle exchanges counted by partitioning kind so the number
        // is not contaminated by BroadcastExchange substring matches
        val shuffles = count("Exchange hashpartitioning") + count("Exchange rangepartitioning") +
          count("Exchange SinglePartition")
        f"$name%-22s shuf=$shuffles%2d bcast=${count("BroadcastExchange")}%2d " +
          f"scan=${count("FileScan parquet")}%2d " +
          f"cart=${count("CartesianProduct")}%d sortagg=${count("SortAggregate")}%d"
      } catch { case e: Throwable => f"$name%-22s ERROR ${e.getMessage.take(60)}" }
    }
    rows.foreach(println)
    spark.stop()
  }
}
