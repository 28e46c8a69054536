package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar geometry math over `array<struct<x:double,y:double>>`
  * linestrings and (x, y) point columns. No GIS dependency, no UDF —
  * pure Catalyst expressions (codegen'd), so every op distributes and
  * pushes through the optimizer.
  *
  * Covers the geometry the reference uses: web-mercator→WGS84
  * reprojection (changegen/generator.py:29-30,563-566), point↔line
  * distance / closest point (ST_ClosestPoint in db.py:129), and the
  * fractional-projection insertion index (`_get_point_insertion_index`,
  * generator.py:208-255).
  */
object Geo {
  val EarthRadius = 6378137.0

  /** See graft.ColumnOps.let — re-exported here for the geometry folds. */
  def let(v: Column)(body: Column => Column): Column = graft.ColumnOps.let(v)(body)

  /** EPSG:3857 → EPSG:4326 longitude (degrees). */
  def mercToLon(x: Column): Column = x / EarthRadius * (lit(180.0) / lit(math.Pi))

  /** EPSG:3857 → EPSG:4326 latitude (degrees). */
  def mercToLat(y: Column): Column =
    (atan(exp(y / EarthRadius)) * 2 - lit(math.Pi / 2)) * (lit(180.0) / lit(math.Pi))

  def pt(x: Column, y: Column): Column = struct(x.as("x"), y.as("y"))

  def dist2(ax: Column, ay: Column, bx: Column, by: Column): Column =
    (ax - bx) * (ax - bx) + (ay - by) * (ay - by)

  def dist(ax: Column, ay: Column, bx: Column, by: Column): Column =
    sqrt(dist2(ax, ay, bx, by))

  /** Closest point on segment a→b to p, as struct(t, x, y) where t is
    * the clamped projection parameter.
    */
  def closestOnSegment(ax: Column, ay: Column, bx: Column, by: Column, px: Column, py: Column): Column = {
    val dx = bx - ax
    val dy = by - ay
    val len2 = dx * dx + dy * dy
    val tRaw = when(len2 === 0, lit(0.0)).otherwise(((px - ax) * dx + (py - ay) * dy) / len2)
    val t = least(greatest(tRaw, lit(0.0)), lit(1.0))
    struct(t.as("t"), (ax + t * dx).as("x"), (ay + t * dy).as("y"))
  }

  /** Closest point on a linestring (array of point structs) to p.
    * Returns struct(d2, seg, t, x, y): squared distance, 0-based segment
    * index, parameter on that segment, and the point. Delegates to the
    * native codegen'd expression (graft.functions.ClosestPointExpr) —
    * bit-identical to the HOF form below, spec-checked.
    */
  def closestOnLine(line: Column, px: Column, py: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_closest_point", line, px, py)

  /** Composable-HOF form of closestOnLine — the reference
    * implementation the native expression is verified against; also
    * usable in sessions without graft's extensions installed.
    */
  def closestOnLineHof(line: Column, px: Column, py: Column): Column = {
    val cands = transform(
      sequence(lit(1), size(line) - 1),
      i => {
        val a = element_at(line, i)
        val b = element_at(line, i + 1)
        val cp = closestOnSegment(a.getField("x"), a.getField("y"), b.getField("x"), b.getField("y"), px, py)
        struct(
          dist2(cp.getField("x"), cp.getField("y"), px, py).as("d2"),
          (i - 1).as("seg"),
          cp.getField("t").as("t"),
          cp.getField("x").as("x"),
          cp.getField("y").as("y")
        )
      }
    )
    array_min(cands)
  }

  /** Cumulative fractional position of each vertex along the line:
    * array<double> of same length as `line`, first element 0.0, last
    * 1.0 (generator.py:229-245).
    */
  def cumulativeFractions(line: Column): Column = {
    val segLens = transform(
      sequence(lit(1), size(line) - 1),
      i => {
        val a = element_at(line, i)
        val b = element_at(line, i + 1)
        dist(a.getField("x"), a.getField("y"), b.getField("x"), b.getField("y"))
      }
    )
    val cums = aggregate(
      segLens,
      array(lit(0.0)),
      (acc, l) => concat(acc, array(element_at(acc, -1) + l))
    )
    let(cums) { cs =>
      let(element_at(cs, -1)) { total =>
        transform(cs, c => when(total === 0, lit(0.0)).otherwise(c / total))
      }
    }
  }

  /** Index (0-based) at which point p should be inserted into the
    * linestring: the smallest vertex index whose fractional position
    * exceeds p's projected fractional position, else len-1
    * (generator.py:247-255).
    */
  def insertionIndex(line: Column, px: Column, py: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_insertion_index", line, px, py)

  /** Composable-HOF form of insertionIndex — the reference
    * implementation the native expression is verified against. */
  def insertionIndexHof(line: Column, px: Column, py: Column): Column =
    let(struct(closestOnLineHof(line, px, py).as("cp"), cumulativeFractions(line).as("fr"))) { s =>
      val cp = s.getField("cp")
      val fr = s.getField("fr")
      // fraction along the whole line of the projected point
      val segStart = element_at(fr, cp.getField("seg") + 1)
      val segEnd = element_at(fr, cp.getField("seg") + 2)
      let(segStart + cp.getField("t") * (segEnd - segStart)) { loc =>
        let(array_position(transform(fr, f => loc < f), lit(true))) { firstGreater =>
          when(firstGreater > 0, firstGreater - 1).otherwise(size(line) - 1).cast("int")
        }
      }
    }
}
