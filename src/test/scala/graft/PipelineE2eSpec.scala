package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.osm.{OsmChangeXml, OsmXmlSource}

/** End-to-end loop: the full changefile pipeline writes an OsmChange
  * document, and the distributed XML source reads it back — element
  * counts must reconcile exactly with the pipeline's own frames.
  */
class PipelineE2eSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pipeline .osc output re-reads to the exact element counts of its frames") {
    val f = ChangegenPipeline.build(spark, TestSpark.Sf, maxNodes = 7, idOffset = Some(1000000L))
    val out = Files.createTempFile("graft_e2e", ".osc").toString
    OsmChangeXml.write(out, f.nodeXml.unionByName(f.wayXml), Some(f.modifyXml), Some(f.deleteXml))

    val nNodes = f.nodes.count()
    val nWays = f.splitWays.count()
    val nModified = f.modified.count()
    val deletesByType = f.deleteSet.groupBy("elem_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // the reader sees nodes in <create> and <delete>, ways in
    // <create>, <modify> and <delete>
    val readNodes = OsmXmlSource.nodes(spark, out).count()
    val readWays = OsmXmlSource.ways(spark, out).count()
    assert(readNodes == nNodes + deletesByType.getOrElse("node", 0L),
      s"nodes: read $readNodes, frames $nNodes + ${deletesByType.getOrElse("node", 0L)}")
    assert(readWays == nWays + nModified + deletesByType.getOrElse("way", 0L),
      s"ways: read $readWays, frames $nWays + $nModified + ${deletesByType.getOrElse("way", 0L)}")

    // created ways must reference only created node ids (referential
    // integrity of the generated document)
    val createdNodeIds = OsmXmlSource.nodes(spark, out).toDF()
      .filter(org.apache.spark.sql.functions.col("id") >= 1000000L)
      .select("id").collect().map(_.getLong(0)).toSet
    val refdByCreatedWays = OsmXmlSource.ways(spark, out).toDF()
      .filter(org.apache.spark.sql.functions.col("id") >= 1000000L)
      .select(org.apache.spark.sql.functions.explode(org.apache.spark.sql.functions.col("nds")).as("n"))
      .collect().map(_.getLong(0)).toSet
    assert(refdByCreatedWays.nonEmpty && refdByCreatedWays.subsetOf(createdNodeIds),
      s"${(refdByCreatedWays -- createdNodeIds).size} dangling node refs in created ways")

    Files.deleteIfExists(Paths.get(out))
  }
}
