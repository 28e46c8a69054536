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

  // WGS84 ellipsoid + transverse-Mercator constants (USGS/Snyder,
  // "Map Projections — A Working Manual", pp. 61-64: the closed-form
  // series every UTM implementation uses)
  private val A = 6378137.0                    // semi-major axis
  private val E2 = 0.00669437999014            // first eccentricity²
  private val Ep2 = E2 / (1.0 - E2)            // second eccentricity²
  private val K0 = 0.9996                      // UTM scale factor
  private val E1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
  private val MuDen = A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256)

  /** UTM (EPSG:326zz north / 327zz south) → WGS84 lon/lat degrees,
    * closed form — the arbitrary-CRS half of the reference's pyproj
    * transformer (generator.py:69-78 builds one from the layer's
    * declared EPSG, db.py:68). Returns struct(lon, lat). Pure column
    * math (sin/cos/tan/sqrt), codegen'd, engine-exact at fp6 next to
    * the DuckDB oracle running the same series.
    */
  def utmToLonLat(easting: Column, northing: Column, zone: Int,
                  southern: Boolean): Column = {
    require(zone >= 1 && zone <= 60, s"UTM zone out of range: $zone")
    val lon0 = math.toRadians((zone - 1) * 6 - 180 + 3)
    val x = easting - lit(500000.0)
    val y = if (southern) northing - lit(10000000.0) else northing
    // Scala vals share subtrees by reference; whole-stage codegen's
    // subexpression elimination evaluates each repeated subtree once
    // per row (this is a top-level projection, NOT a HOF lambda — the
    // one context where `let` would be needed and codegen lost).
    val mu = y / lit(K0) / lit(MuDen)            // rectifying latitude
    // footpoint latitude from the inverse meridian-arc series
    val phi1 = mu +
      lit(3 * E1 / 2 - 27 * math.pow(E1, 3) / 32) * sin(mu * 2) +
      lit(21 * E1 * E1 / 16 - 55 * math.pow(E1, 4) / 32) * sin(mu * 4) +
      lit(151 * math.pow(E1, 3) / 96) * sin(mu * 6) +
      lit(1097 * math.pow(E1, 4) / 512) * sin(mu * 8)
    val s1 = sin(phi1)
    val c1 = cos(phi1)
    val t1 = s1 / c1
    val tt = t1 * t1                              // T1 = tan²(phi1)
    val cc = lit(Ep2) * c1 * c1                   // C1
    val w = lit(1.0) - lit(E2) * s1 * s1
    val n1 = lit(A) / sqrt(w)
    val r1 = lit(A * (1 - E2)) / (w * sqrt(w))
    val d = x / (n1 * lit(K0))
    val d2 = d * d
    val lat = phi1 - (n1 * t1 / r1) * (d2 / 2
      - (lit(5.0) + lit(3.0) * tt + lit(10.0) * cc
         - lit(4.0) * cc * cc - lit(9.0 * Ep2)) * d2 * d2 / 24
      + (lit(61.0) + lit(90.0) * tt + lit(298.0) * cc
         + lit(45.0) * tt * tt - lit(252.0 * Ep2)
         - lit(3.0) * cc * cc) * d2 * d2 * d2 / 720)
    val lonOff = (d - (lit(1.0) + lit(2.0) * tt + cc) * d * d2 / 6
      + (lit(5.0) - lit(2.0) * cc + lit(28.0) * tt
         - lit(3.0) * cc * cc + lit(8.0 * Ep2)
         + lit(24.0) * tt * tt) * d * d2 * d2 / 120) / c1
    struct(
      ((lit(lon0) + lonOff) * lit(180.0 / math.Pi)).as("lon"),
      (lat * lit(180.0 / math.Pi)).as("lat"))
  }

  /** DuckDB-SQL twin of [[utmToLonLat]] for oracle derivation: a CTE
    * chain over a base relation carrying `e_in`/`n_in` (easting/
    * northing doubles), ending in relation `u8` with `lon_deg`/
    * `lat_deg`. Every intermediate mirrors one Scala val above with
    * IDENTICAL constants (Scala Double.toString round-trips to the
    * same bits in DuckDB's parser) and identical operation order, so
    * the engines agree to libm's last ulp — far inside fp6.
    */
  def utmToLonLatSqlCtes(base: String, zone: Int, southern: Boolean): String = {
    require(zone >= 1 && zone <= 60, s"UTM zone out of range: $zone")
    val lon0 = math.toRadians((zone - 1) * 6 - 180 + 3)
    val c2 = 3 * E1 / 2 - 27 * math.pow(E1, 3) / 32
    val c4 = 21 * E1 * E1 / 16 - 55 * math.pow(E1, 4) / 32
    val c6 = 151 * math.pow(E1, 3) / 96
    val c8 = 1097 * math.pow(E1, 4) / 512
    val deg = 180.0 / math.Pi
    val y = if (southern) "(n_in - 10000000.0)" else "n_in"
    s"""u1 AS (SELECT *, $y / $K0 / $MuDen AS mu FROM $base),
       |u2 AS (SELECT *, mu + $c2 * sin(mu * 2) + $c4 * sin(mu * 4)
       |  + $c6 * sin(mu * 6) + $c8 * sin(mu * 8) AS phi1 FROM u1),
       |u3 AS (SELECT *, sin(phi1) AS s1, cos(phi1) AS c1 FROM u2),
       |u4 AS (SELECT *, s1 / c1 AS t1, $Ep2 * c1 * c1 AS cc,
       |  1.0 - $E2 * s1 * s1 AS w FROM u3),
       |u5 AS (SELECT *, t1 * t1 AS tt, $A / sqrt(w) AS n1,
       |  ${A * (1 - E2)} / (w * sqrt(w)) AS r1 FROM u4),
       |u6 AS (SELECT *, (e_in - 500000.0) / (n1 * $K0) AS d FROM u5),
       |u7 AS (SELECT *, d * d AS d2 FROM u6),
       |u8 AS (SELECT *,
       |  ($lon0 + (d - (1.0 + 2.0 * tt + cc) * d * d2 / 6
       |    + (5.0 - 2.0 * cc + 28.0 * tt - 3.0 * cc * cc + ${8.0 * Ep2}
       |       + 24.0 * tt * tt) * d * d2 * d2 / 120) / c1) * $deg AS lon_deg,
       |  (phi1 - (n1 * t1 / r1) * (d2 / 2
       |    - (5.0 + 3.0 * tt + 10.0 * cc - 4.0 * cc * cc - ${9.0 * Ep2}) * d2 * d2 / 24
       |    + (61.0 + 90.0 * tt + 298.0 * cc + 45.0 * tt * tt - ${252.0 * Ep2}
       |       - 3.0 * cc * cc) * d2 * d2 * d2 / 720)) * $deg AS lat_deg
       |  FROM u7)""".stripMargin
  }

  /** Per-layer CRS dispatch — the analog of the reference building a
    * transformer from `get_layer_epsg` (generator.py:69-78): 4326
    * passthrough, 3857 web-mercator, 326zz/327zz UTM. Unknown EPSG
    * fails loudly at plan-build time (a silent wrong projection is
    * the worst spatial bug). Returns struct(lon, lat) degrees.
    */
  def reproject(x: Column, y: Column, srcEpsg: Int): Column = srcEpsg match {
    case 4326 => struct(x.as("lon"), y.as("lat"))
    case 3857 => struct(mercToLon(x).as("lon"), mercToLat(y).as("lat"))
    case z if z >= 32601 && z <= 32660 => utmToLonLat(x, y, z - 32600, southern = false)
    case z if z >= 32701 && z <= 32760 => utmToLonLat(x, y, z - 32700, southern = true)
    case other => throw new IllegalArgumentException(
      s"unsupported source CRS EPSG:$other (supported: 4326, 3857, 326zz/327zz UTM)")
  }

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
      // fp9-quantized compare (see InsertionIndexExpr): a projection
      // landing exactly ON a vertex must insert AFTER it on every
      // engine, regardless of best-segment tie-breaks and last-ulp
      // rounding of segStart + t*(segEnd-segStart)
      let(graft.text.TextAnalysis.fp(segStart + cp.getField("t") * (segEnd - segStart), 9)) { locQ =>
        let(array_position(transform(fr, f => locQ < graft.text.TextAnalysis.fp(f, 9)), lit(true))) { firstGreater =>
          when(firstGreater > 0, firstGreater - 1).otherwise(size(line) - 1).cast("int")
        }
      }
    }
}
