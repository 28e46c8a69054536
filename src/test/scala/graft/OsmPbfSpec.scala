package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.osm.{OsmModel, OsmPbf}

class OsmPbfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Golden fixture encoded by an INDEPENDENT Python protobuf encoder
    * (src/test/resources/golden.osm.pbf): raw OSMHeader blob + one
    * zlib OSMData block with dense nodes (delta/zigzag ids & coords,
    * keys_vals runs, denseinfo versions), a way (delta refs, Info
    * version) and a relation (roles_sid/memids/types), granularity
    * field AFTER the groups. Guards the reader against writer/reader
    * sharing a bug.
    */
  test("reads the independently-encoded golden pbf") {
    val path = getClass.getResource("/golden.osm.pbf").getPath
    val nodes = OsmPbf.nodes(spark, path).collect().sortBy(_.id).toSeq
    assert(nodes.map(n => (n.id, n.version, n.tags)) == Seq(
      (100L, 1, Map("amenity" -> "pub")), (101L, 2, Map.empty[String, String])))
    assert(math.abs(nodes(0).lat - 51.5) < 1e-9 && math.abs(nodes(0).lon - (-0.12)) < 1e-9)
    assert(math.abs(nodes(1).lat - 51.6) < 1e-9 && math.abs(nodes(1).lon - (-0.11)) < 1e-9)
    val way = OsmPbf.ways(spark, path).collect().head
    assert(way == OsmModel.Way(200L, 3, Seq(100L, 101L), Map("highway" -> "path")))
    val rel = OsmPbf.relations(spark, path).collect().head
    assert(rel == OsmModel.Relation(300L, 1, Seq(OsmModel.Member(200L, "way", "outer")), Map.empty))
  }

  test("writer/reader round-trip across multiple blocks with negative ids and coords") {
    val nodes = (1 to 50).map { i =>
      OsmModel.Node(
        if (i % 2 == 0) -i.toLong * 1000 else i.toLong * 1000, 1 + i % 3,
        -89.0 + i * 3.1, -179.0 + i * 6.7,
        if (i % 3 == 0) Map("name" -> s"n$i", "ele" -> s"${i * 10}") else Map.empty)
    }
    val ways = (1 to 20).map { i =>
      OsmModel.Way(i.toLong * 7, 1, (1 to 5).map(j => (i * j).toLong - 3), Map("highway" -> "residential"))
    }
    val rels = Seq(
      OsmModel.Relation(42L, 2,
        Seq(OsmModel.Member(7L, "way", "outer"), OsmModel.Member(-2000L, "node", ""),
          OsmModel.Member(14L, "way", "inner")),
        Map("type" -> "multipolygon")))
    val path = Files.createTempFile("graft", ".osm.pbf").toString
    // blockSize 16 → multiple OSMData blobs exercise the split index
    OsmPbf.write(path, nodes, ways, rels, blockSize = 16)

    val rn = OsmPbf.nodes(spark, path).collect().sortBy(_.id).toSeq
    val expN = nodes.sortBy(_.id)
    assert(rn.map(n => (n.id, n.version, n.tags)) == expN.map(n => (n.id, n.version, n.tags)))
    rn.zip(expN).foreach { case (a, b) =>
      assert(math.abs(a.lat - b.lat) < 1e-7 && math.abs(a.lon - b.lon) < 1e-7,
        s"coord drift for ${a.id}: $a vs $b")
    }
    assert(OsmPbf.ways(spark, path).collect().sortBy(_.id).toSeq == ways.sortBy(_.id))
    assert(OsmPbf.relations(spark, path).collect().toSeq == rels)
    Files.deleteIfExists(Paths.get(path))
  }

  test("large incompressible blocks survive the deflate bound") {
    // md5-derived tag values are effectively incompressible; one block
    // of 8000 such nodes stresses the worst-case deflate sizing
    val nodes = (1 to 8000).map { i =>
      OsmModel.Node(i.toLong, 1, (i % 180) - 90 + 0.1, (i % 360) - 180 + 0.1,
        Map("h" -> org.apache.commons.codec.digest.DigestUtils.md5Hex(s"payload-$i") * 4))
    }
    val path = Files.createTempFile("graft_big", ".osm.pbf").toString
    OsmPbf.write(path, nodes, Nil, Nil)
    val back = OsmPbf.nodes(spark, path).count()
    assert(back == 8000)
    val one = OsmPbf.nodes(spark, path).filter(_.id == 42L).collect().head
    assert(one.tags("h") == org.apache.commons.codec.digest.DigestUtils.md5Hex("payload-42") * 4)
    Files.deleteIfExists(Paths.get(path))
  }

  test("pbf way-node ingestion feeds the wayNodeMap contract (reference generator.py:35-53)") {
    val path = Files.createTempFile("graft", ".osm.pbf").toString
    OsmPbf.write(path,
      nodes = (1L to 6L).map(i => OsmModel.Node(i, 1, i * 0.1, i * 0.2, Map.empty)),
      ways = Seq(OsmModel.Way(10L, 1, Seq(1L, 2L, 3L), Map.empty),
        OsmModel.Way(11L, 1, Seq(4L, 5L, 6L), Map.empty)),
      relations = Nil)
    import spark.implicits._
    val wnm = OsmPbf.ways(spark, path).toDF()
      .select(org.apache.spark.sql.functions.col("id").as("way"),
        org.apache.spark.sql.functions.posexplode(org.apache.spark.sql.functions.col("nds")).as(Seq("pos", "node")))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(wnm == Seq((10L, 0, 1L), (10L, 1, 2L), (10L, 2, 3L), (11L, 0, 4L), (11L, 1, 5L), (11L, 2, 6L)))
    Files.deleteIfExists(Paths.get(path))
  }
}
