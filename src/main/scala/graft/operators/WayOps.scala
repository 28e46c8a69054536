package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Way-level structural operators: splitting long ways, closing rings,
  * assembling multipolygon relations, and expanding deletions — Spark
  * re-expressions of `_make_ways` (changegen/generator.py:258-304),
  * the closed-way / relation logic (generator.py:661-753), and deletion
  * expansion (generator.py:859-866, 876-927).
  *
  * Node lists are `array<long>` columns; everything below is columnar
  * (`slice`/`sequence`/`transform`), so it distributes and codegens —
  * no per-feature driver loop as in the reference.
  */
object WayOps {

  /** Split a node list into chunks of at most `segmentLen` when it
    * exceeds `nodeLimit`, adjacent chunks sharing a joiner node (the
    * previous chunk's last node is prepended to the next chunk).
    *
    * Note: the reference (generator.py:284-301) intends shared junction
    * nodes ("we must ensure that the newly-created Ways share a node")
    * but prepends the *next* chunk's first node — an off-by-one that
    * duplicates a node instead of sharing one. We implement the
    * documented intent.
    *
    * If `closed` and the way is NOT split, the first node is appended to
    * the end (ring closing, generator.py:278-280; rings exceeding the
    * limit are left open per reference behavior).
    *
    * Input: df with `ndsCol: array<long>`. Output: original columns plus
    * `chunk_idx: int`, `chunk_nds: array<long>`.
    */
  def splitWay(df: DataFrame, ndsCol: String, nodeLimit: Int = 2000, segmentLen: Int = 500, closed: Boolean = false): DataFrame = {
    val nds = col(ndsCol)
    val n = size(nds)
    val single = if (closed) concat(nds, slice(nds, 1, 1)) else nds
    val nChunks = ceil(n.cast("double") / segmentLen).cast("int")
    val chunks = when(n <= nodeLimit, array(single)).otherwise(
      transform(
        sequence(lit(0), nChunks - 1),
        i =>
          when(i === 0, slice(nds, lit(1), lit(segmentLen)))
            .otherwise(concat(array(element_at(nds, i * segmentLen)), slice(nds, i * segmentLen + 1, lit(segmentLen))))
      )
    )
    df.withColumn("_chunks", chunks)
      .select(df.columns.map(col) :+ posexplode(col("_chunks")).as(Seq("chunk_idx", "chunk_nds")): _*)
      .drop("_chunks")
  }

  /** Relation members (role rows) for a multipolygon: one `outer` row
    * per outer-ring way id, one `inner` per hole way id
    * (generator.py:732-753). Input columns: relation key + arrays of
    * way ids. Output: key, member_ref, member_type, member_role.
    */
  def multipolygonMembers(df: DataFrame, keyCols: Seq[String], outerWays: Column, innerWays: Column): DataFrame = {
    val members = concat(
      transform(outerWays, w => struct(w.as("member_ref"), lit("way").as("member_type"), lit("outer").as("member_role"))),
      transform(innerWays, w => struct(w.as("member_ref"), lit("way").as("member_type"), lit("inner").as("member_role")))
    )
    df.withColumn("_m", explode(members))
      .select(keyCols.map(col) :+ col("_m.member_ref") :+ col("_m.member_type") :+ col("_m.member_role"): _*)
  }

  /** Relation tying the chunks of a split way together —
    * `_generate_relation_for_ways` (changegen/generator.py:380-395):
    * one relation per original way holding every chunk way as an
    * ordered `outer`/`way` member. Ways that did not split (single
    * chunk) get no relation. Chunk way ids are the caller's (e.g.
    * assigned by SequentialIds); input carries them per chunk row.
    *
    * Input: (wayCol, chunkIdxCol, chunkWayIdCol). Output: wayCol,
    * member_pos, member_ref, member_type, member_role — one row per
    * member, ordered by chunk index. One shuffle on the way key.
    */
  def relationForSplitWays(df: DataFrame, wayCol: String, chunkIdxCol: String, chunkWayIdCol: String): DataFrame =
    df.groupBy(col(wayCol))
      .agg(array_sort(collect_list(struct(col(chunkIdxCol).as("i"), col(chunkWayIdCol).as("w")))).as("_iw"))
      .filter(size(col("_iw")) >= 2)
      .select(col(wayCol), posexplode(transform(col("_iw"), x => x.getField("w"))).as(Seq("member_pos", "member_ref")))
      .withColumn("member_type", lit("way"))
      .withColumn("member_role", lit("outer"))

  /** Expand deleted ways into the full delete set: each way id plus its
    * constituent node ids, each node written once even when shared by
    * several deleted ways (generator.py:911-926). Input: (wayIdCol,
    * ndsCol array). Output: (elem_type: 'node'|'way', elem_id).
    */
  def expandDeletes(df: DataFrame, wayIdCol: String, ndsCol: String): DataFrame = {
    val ways = df.select(lit("way").as("elem_type"), col(wayIdCol).cast("long").as("elem_id")).distinct()
    val nodes = df
      .select(explode(col(ndsCol)).as("elem_id"))
      .select(lit("node").as("elem_type"), col("elem_id").cast("long"))
      .distinct()
    nodes.unionByName(ways)
  }

  /** way → ordered node list from an exploded (way, seq, node) edge
    * table — the distributed analog of `_get_way_node_map`
    * (generator.py:35-53), which scans a .pbf into a driver dict.
    * One shuffle on way id; array order restored from seq.
    */
  def wayNodeMap(edges: DataFrame, wayCol: String, seqCol: String, nodeCol: String): DataFrame =
    edges
      .groupBy(col(wayCol))
      .agg(array_sort(collect_list(struct(col(seqCol).as("s"), col(nodeCol).as("n")))).as("_sn"))
      .withColumn("nds", transform(col("_sn"), x => x.getField("n")))
      .drop("_sn")
}
