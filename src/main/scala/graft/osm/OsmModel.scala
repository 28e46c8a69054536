package graft.osm

/** Flat OSM element model (SURVEY §3) — the Dataset-typed view of the
  * reference's element classes (changegen/changewriter.py:22-45:
  * Node/Way/Relation namedtuples).
  *
  * Geometry stays columnar (`array<struct<x,y>>`) in DataFrames;
  * these case classes are for the typed API surface and encoders.
  */
object OsmModel {

  case class Node(
      id: Long,
      version: Int,
      lat: Double,
      lon: Double,
      tags: Map[String, String])

  case class Way(
      id: Long,
      version: Int,
      nds: Seq[Long],
      tags: Map[String, String])

  case class Member(ref: Long, mtype: String, role: String)

  case class Relation(
      id: Long,
      version: Int,
      members: Seq[Member],
      tags: Map[String, String])
}
