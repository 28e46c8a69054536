package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local-iteration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.stop()
  }
}
