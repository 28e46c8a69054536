package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{SnapshotDiff, TagOps}
import graft.osm.OsmChangeXml

/** End-to-end changefile generation — the reference's whole pipeline
  * (changegen/generator.py:496-873 + changewriter.py) as one
  * distributed dataflow: snapshot diff → tag construction → element
  * XML → single OsmChange file.
  *
  * Usage: runMain graft.ChangegenPipeline <sfDir> <out.osc.gz>
  * Demonstrates the library surface over the driver testdata: the
  * "old" and "new" snapshots are derived from `customer` the same way
  * the verified cg_diff_* queries derive them.
  */
object ChangegenPipeline {

  def nodesXml(df: DataFrame): DataFrame = {
    val latU = col("c_custkey") * 7919 % 180000000L - 90000000L
    val lonU = col("c_custkey") * 104729 % 360000000L - 180000000L
    val tags = map(lit("name"), col("c_name"), lit("segment"), col("c_mktsegment"))
    df.select(OsmChangeXml.nodeXml(col("c_custkey"), lit(1), latU, lonU, tags).as("xml"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/graft_demo.osc.gz"
    val spark = GraftSession.get()
    val customer = Tables.load(spark, sfDir, "customer")
    val oldSnap = customer.filter(col("c_custkey") % 11 =!= 3)
    val newSnap = customer.filter(col("c_custkey") % 13 =!= 5)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 17 === 0, lit("RESEGMENTED")).otherwise(col("c_mktsegment")))

    val creates = nodesXml(SnapshotDiff.creates(oldSnap, newSnap, Seq("c_custkey")))
    val modifies = nodesXml(SnapshotDiff.modifies(oldSnap, newSnap, Seq("c_custkey"), Seq("c_name", "c_mktsegment")))
    val deletes = SnapshotDiff.deletes(oldSnap, newSnap, Seq("c_custkey"))
      .select(concat(lit("<node id=\""), col("c_custkey"), lit("\" version=\"1\" lat=\"0.000000\" lon=\"0.000000\"/>")).as("xml"))

    OsmChangeXml.write(out, creates, Some(modifies), Some(deletes), gzip = out.endsWith(".gz"))
    println(s"[changegen] wrote $out: creates=${creates.count()} modifies=${modifies.count()} deletes=${deletes.count()}")
    spark.stop()
  }
}
