package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance-based spatial join — the Spark re-expression of the
  * reference's PostGIS `ST_DWithin` intersection queries
  * (changegen/db.py:102-185). PostGIS gets an R-tree for free; on Spark
  * the scalable equivalent is a **grid-bucket equi-join**:
  *
  *   1. hash both sides into square cells of side = radius,
  *   2. replicate the left side to its cell + 8 neighbors (constant 9×
  *      blow-up, independent of data size),
  *   3. shuffle-join on cell id (plain equi-join: partial aggregation,
  *      AQE skew handling, and broadcast all apply),
  *   4. exact distance filter.
  *
  * Each right row lives in exactly one cell so no pair dedup is needed.
  * This is linear in |L|+|R| + output, never a cross join, and the
  * shuffle key (cell) is data-distribution-aligned — dense regions can
  * be salted by subdividing cells, hook left for later rounds.
  */
object DWithinJoin {

  /** Point-point within-radius join.
    * left: (leftId, lx, ly), right: (rightId, rx, ry) column names.
    * Output: leftId, rightId, dist (double).
    *
    * `cellsPerRadius` is the skew lever: cell side = radius/k, so a
    * dense region spreads over k² more shuffle keys at the cost of a
    * (2k+1)²/9× larger (but constant) left replication. k=1 for
    * uniform data; raise for clustered data (cities in OSM). AQE's
    * skew-join split handles residual imbalance within a cell.
    */
  def pointPoint(
      left: DataFrame,
      leftId: String,
      lx: String,
      ly: String,
      right: DataFrame,
      rightId: String,
      rx: String,
      ry: String,
      radius: Double,
      cellsPerRadius: Int = 1,
      excludeEqual: Boolean = false
  ): DataFrame = {
    require(cellsPerRadius >= 1, "cellsPerRadius must be >= 1")
    val k = cellsPerRadius
    val cell = lit(radius / k)
    val offsets = -k to k
    val lCells = left.select(
      col(leftId),
      col(lx).as("_lx"),
      col(ly).as("_ly"),
      explode(
        array(
          (for (dx <- offsets; dy <- offsets)
            yield struct(
              (floor(col(lx) / cell) + dx).cast("long").as("cx"),
              (floor(col(ly) / cell) + dy).cast("long").as("cy")
            )): _*
        )
      ).as("_cell")
    )
    val rCells = right.select(
      col(rightId),
      col(rx).as("_rx"),
      col(ry).as("_ry"),
      struct(floor(col(rx) / cell).cast("long").as("cx"), floor(col(ry) / cell).cast("long").as("cy")).as("_cell")
    )
    val joined = lCells
      .join(rCells, "_cell")
      .withColumn("dist", Geo.dist(col("_lx"), col("_ly"), col("_rx"), col("_ry")))
      .filter(col("dist") <= radius)
    // `excludeEqual` is the reference's `not st_equals(n.geom, o.geom)`
    // (db.py:134): drop pairs whose GEOMETRIES coincide — two distinct
    // features at the same location do not intersect-report each
    // other. Point st_equals = exact coordinate equality.
    val excluded =
      if (excludeEqual) joined.filter(!(col("_lx") === col("_rx") && col("_ly") === col("_ry")))
      else joined
    excluded.select(col(leftId), col(rightId), col("dist"))
  }

  /** Point-linestring within-radius join: right side carries a
    * `array<struct<x,y>>` geometry. Same grid strategy; each linestring
    * is replicated to every cell its bounding box (padded by radius)
    * covers — for OSM-scale ways this is a small constant.
    * Output: leftId, rightId, dist, plus the closest point (cp_x, cp_y).
    */
  def pointLine(
      left: DataFrame,
      leftId: String,
      lx: String,
      ly: String,
      right: DataFrame,
      rightId: String,
      lineCol: String,
      radius: Double
  ): DataFrame = {
    val r = lit(radius)
    val xs = transform(col(lineCol), p => p.getField("x"))
    val ys = transform(col(lineCol), p => p.getField("y"))
    // replicate ONLY (id, cell) over the padded bbox — not the
    // geometry. A long line covers bbox_area/r² cells; carrying the
    // vertex array through that explosion multiplies the shuffle by
    // the line size (measured 320 MB for 5 lines at sf0.1). The
    // geometry is re-attached per candidate by id below (AQE
    // broadcasts it when small; plain equi-join otherwise).
    val rCells = right
      .select(
        col(rightId).as("_rid"),
        explode(
          flatten(
            transform(
              sequence(floor((array_min(xs) - r) / r).cast("long"), floor((array_max(xs) + r) / r).cast("long")),
              cx =>
                transform(
                  sequence(floor((array_min(ys) - r) / r).cast("long"), floor((array_max(ys) + r) / r).cast("long")),
                  cy => struct(cx.as("cx"), cy.as("cy"))
                )
            )
          )
        ).as("_cell")
      )
    val lCells = left.select(
      col(leftId),
      col(lx).as("_lx"),
      col(ly).as("_ly"),
      struct(floor(col(lx) / r).cast("long").as("cx"), floor(col(ly) / r).cast("long").as("cy")).as("_cell")
    )
    val geom = right.select(col(rightId), col(lineCol).as("_line"))
    val cp = Geo.closestOnLine(col("_line"), col("_lx"), col("_ly"))
    lCells
      .join(rCells, "_cell")
      .join(geom, col("_rid") === col(rightId))
      .withColumn("_cp", cp)
      .withColumn("dist", sqrt(col("_cp.d2")))
      .filter(col("dist") <= radius)
      .select(col(leftId), col(rightId), col("dist"), col("_cp.x").as("cp_x"), col("_cp.y").as("cp_y"))
    // no dedup needed: the point occupies exactly ONE cell, so a
    // (point, line) pair meets at most once however many cells the
    // line is replicated to
  }

  /** Line-linestring within-radius join — the reference's actual
    * `st_dwithin(new.geometry, old.geometry, buffer)` between
    * LINESTRING geometries (changegen/db.py:127-135). Both sides carry
    * `array<struct<x,y>>` geometry columns.
    *
    * Grid strategy: the left line replicates to every cell of its
    * radius-padded bbox, the right to its unpadded bbox cells; two
    * lines within `radius` always share at least one cell. Since BOTH
    * sides are replicated, a pair can meet in many cells — instead of
    * a distinct-shuffle, each side carries its bbox cell minima and
    * the pair is kept only in its canonical cell (the lexicographic
    * smallest common cell: elementwise max of the two minima), which
    * is exactly-once by construction.
    *
    * The exact predicate is the native `graft_line_dist2` (proper
    * segment crossing → 0, else endpoint-to-segment minima — true
    * segment distance, not densified). Output: leftId, rightId, dist.
    *
    * ID CONTRACT: `leftId` / `rightId` must be UNIQUE within their
    * side. The cell shuffle carries only (id, cell, bbox-min) and the
    * geometry re-attaches to each candidate pair by an id equi-join,
    * so a duplicated id would fan a candidate out over every row
    * sharing it (and cross-pair their geometries). Every caller here
    * derives the id from a per-feature key; assert uniqueness upstream
    * if yours does not. */
  def lineLine(
      left: DataFrame,
      leftId: String,
      leftLine: String,
      right: DataFrame,
      rightId: String,
      rightLine: String,
      radius: Double,
      excludeEqual: Boolean = false,
      keepLines: Boolean = false
  ): DataFrame = {
    require(leftId != rightId, s"lineLine needs distinct id column names, got '$leftId' twice")
    val r = lit(radius)
    def xs(c: Column) = transform(c, p => p.getField("x"))
    def ys(c: Column) = transform(c, p => p.getField("y"))
    // replicate ONLY (id, cell, bbox-min) over the bbox cells — not
    // the geometry (the pointLine lesson: carrying the vertex array
    // through the cell explosion multiplies the cell shuffle by the
    // line size; a corpus-scale feature table with long ways pays
    // that on BOTH sides here). Geometry re-attaches per CANDIDATE
    // PAIR by id after the canonical-cell filter, so the exact
    // predicate still runs once per pair on exactly-once rows.
    def cellsOf(df: DataFrame, id: String, lineCol: String, pad: Column,
                idOut: String, cxm: String, cym: String) = {
      val cxMin = floor((array_min(xs(col(lineCol))) - pad) / r).cast("long")
      val cxMax = floor((array_max(xs(col(lineCol))) + pad) / r).cast("long")
      val cyMin = floor((array_min(ys(col(lineCol))) - pad) / r).cast("long")
      val cyMax = floor((array_max(ys(col(lineCol))) + pad) / r).cast("long")
      df.select(col(id).as(idOut),
          cxMin.as(cxm), cyMin.as(cym), cxMax.as("_cxmax"), cyMax.as("_cymax"))
        .withColumn("_cell", explode(flatten(transform(
          sequence(col(cxm), col("_cxmax")),
          cx => transform(sequence(col(cym), col("_cymax")), cy => struct(cx.as("cx"), cy.as("cy")))))))
        .drop("_cxmax", "_cymax")
    }
    val lCells = cellsOf(left, leftId, leftLine, r, "_lid0", "_lcx0", "_lcy0")
    val rCells = cellsOf(right, rightId, rightLine, lit(0.0), "_rid0", "_rcx0", "_rcy0")
    val lGeom = left.select(col(leftId).as("_lid0"), col(leftLine).as("_lline"))
    val rGeom = right.select(col(rightId).as("_rid0"), col(rightLine).as("_rline"))
    val joined = lCells
      .join(rCells, "_cell")
      // canonical cell: exactly-once without a distinct shuffle
      .filter(col("_cell.cx") === greatest(col("_lcx0"), col("_rcx0")) &&
        col("_cell.cy") === greatest(col("_lcy0"), col("_rcy0")))
      .select(col("_lid0").as(leftId), col("_rid0").as(rightId))
      .join(lGeom.withColumnRenamed("_lid0", leftId), leftId)
      .join(rGeom.withColumnRenamed("_rid0", rightId), rightId)
      .withColumn("dist", sqrt(call_function("graft_line_dist2", col("_lline"), col("_rline"))))
      .filter(col("dist") <= radius)
    // reference's `not st_equals` (db.py:134) for linestrings:
    // vertex-array equality (same coords in the same order). Cheap —
    // it only runs on within-radius candidate pairs.
    val excluded =
      if (excludeEqual) joined.filter(!(col("_lline") === col("_rline")))
      else joined
    // keepLines: callers that derive a per-pair geometry (e.g. the
    // --self junction pass computes graft_line_closest on each
    // candidate pair) read the arrays straight off the join output
    // instead of re-joining both sides by id
    if (keepLines)
      excluded.select(col(leftId), col(rightId), col("dist"), col("_lline"), col("_rline"))
    else
      excluded.select(col(leftId), col(rightId), col("dist"))
  }
}
