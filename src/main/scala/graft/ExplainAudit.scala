package graft

import java.nio.file.{Files, Paths}

/** Dump the formatted physical plan of every registered query to
  * <outDir>/<name>.txt plus a one-line summary (exchanges, broadcasts,
  * codegen spans, scans) — the `.explain` audit loop SURVEY §4 calls
  * for. Usage: runMain graft.ExplainAudit <sfDir> <outDir> [--execute]
  *
  * `--execute` drives each query to completion FIRST (through its own
  * QueryExecution, no row deserialization) so the printed plan is the
  * FINAL adaptive one — AQE's runtime join-strategy changes, coalesced
  * shuffle reads, and any skew-split degradations are visible, where
  * the default (un-executed) audit only shows the initial plan AQE
  * starts from. Run it against a scaled fixture to audit what AQE
  * actually does at size, not what the static planner proposed.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val execute = args.lift(2).contains("--execute")
    // local iteration: a trailing comma-list restricts the audited set
    val only = args.drop(2).filterNot(_ == "--execute").headOption
      .map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (execute) df.queryExecution.toRdd.foreachPartition(_ => ())
        Files.writeString(Paths.get(s"$outDir/$name.txt"),
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
        // Count in SimpleMode output: nodes print inline there
        // ("+- Exchange hashpartitioning(...)"), whereas FormattedMode splits
        // the node name from its Arguments: line and the pattern never matches.
        val rawPlan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
        // executed AQE trees print "== Final Plan ==" AND "== Initial
        // Plan ==" sections — counting both would double every node.
        // Keep text outside initial-plan sections (an initial section
        // runs until the next tree's final section begins).
        val plan = rawPlan.split("== Initial Plan ==").zipWithIndex.map { case (seg, i) =>
          if (i == 0) seg
          else seg.split("== Final Plan ==").drop(1).mkString
        }.mkString
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
