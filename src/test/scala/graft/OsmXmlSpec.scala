package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.osm.OsmChangeXml

class OsmXmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("element XML escapes attributes and sorts tags") {
    val xml = Seq((1L, Map("b" -> "x<y", "a" -> "q\"z")))
      .toDF("id", "tags")
      .select(OsmChangeXml.nodeXml(col("id"), lit(2), lit(1500000L), lit(-2500000L), col("tags")))
      .as[String].head()
    assert(xml == """<node id="1" version="2" lat="1.500000" lon="-2.500000">""" +
      """<tag k="a" v="q&quot;z"/><tag k="b" v="x&lt;y"/></node>""")
  }

  test("way and relation XML render refs and members in order") {
    val way = Seq((5L, Seq(1L, 2L, 3L), Map.empty[String, String])).toDF("id", "nds", "tags")
      .select(OsmChangeXml.wayXml(col("id"), lit(1), col("nds"), col("tags"))).as[String].head()
    assert(way == """<way id="5" version="1"><nd ref="1"/><nd ref="2"/><nd ref="3"/></way>""")
    val rel = Seq((9L, Seq((4L, "way", "outer"), (6L, "way", "inner")), Map.empty[String, String]))
      .toDF("id", "members", "tags")
      .withColumn("members", expr("transform(members, m -> struct(m._1 AS ref, m._2 AS mtype, m._3 AS role))"))
      .select(OsmChangeXml.relationXml(col("id"), lit(1), col("members"), col("tags"))).as[String].head()
    assert(rel == """<relation id="9" version="1"><member type="way" ref="4" role="outer"/>""" +
      """<member type="way" ref="6" role="inner"/></relation>""")
  }

  test("write() assembles a gzipped OsmChange document") {
    val creates = Seq((1L, Map("k" -> "v"))).toDF("id", "tags")
      .select(OsmChangeXml.nodeXml(col("id"), lit(1), lit(1000000L), lit(2000000L), col("tags")).as("xml"))
    val deletes = Seq(7L).toDF("id").select(concat(lit("<node id=\""), col("id"), lit("\"/>")).as("xml"))
    val out = Files.createTempFile("graft", ".osc.gz").toString
    OsmChangeXml.write(out, creates, deletes = Some(deletes), gzip = true)
    val content = new String(new GZIPInputStream(Files.newInputStream(Paths.get(out))).readAllBytes())
    assert(content.startsWith("<?xml version='1.0' encoding='UTF-8'?>"))
    assert(content.contains("<osmChange version=\"0.6\" generator=\"graft\">"))
    assert(content.contains("<create>\n") && content.contains("</create>"))
    assert(content.contains("""<node id="1" version="1" lat="1.000000" lon="2.000000"><tag k="k" v="v"/></node>"""))
    assert(content.contains("<delete>\n") && content.contains("""<node id="7"/>"""))
    assert(content.endsWith("</osmChange>\n"))
    Files.deleteIfExists(Paths.get(out))
  }
}
