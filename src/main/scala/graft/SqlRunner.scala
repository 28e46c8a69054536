package graft

/** Ad-hoc SQL entry point: registers the testdata tables as temp views
  * plus graft's native functions, runs each argument as a SQL
  * statement, and prints the results — the spark-sql-style surface for
  * exploring the engine.
  *
  * Usage: runMain graft.SqlRunner <sfDir> <sql> [<sql> ...]
  */
object SqlRunner {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.get()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        try Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
        catch { case _: Throwable => () } // missing table: skip view
      }
    args.drop(1).foreach { sql =>
      try spark.sql(sql).show(50, truncate = false)
      catch { case e: Exception => println(s"[sql-error] ${e.getMessage.linesIterator.take(3).mkString(" | ")}") }
    }
    spark.stop()
  }
}
