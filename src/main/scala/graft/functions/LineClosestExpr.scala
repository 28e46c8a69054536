package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native closest point ON the left polyline to the right polyline —
  * the reference's `ST_ClosestPoint(n.geometry, o.geometry)` over its
  * `ST_DWithin` candidate pairs (changegen/db.py:125-135), the
  * primitive behind `--self` junction generation (the intersection
  * nodes of `_generate_intersection_db`, generator.py:99-158).
  *
  * Same segment-pair walk as [[LineDistExpr]] (shared candidate
  * arithmetic so the two agree on WHICH pair is closest):
  *   - properly crossing segments → the crossing point (distance 0),
  *     solved parametrically on the LEFT segment;
  *   - otherwise the argmin of the four endpoint candidates, each
  *     realized as a point ON the left segment (left endpoints
  *     themselves; right endpoints via clamped projection).
  * First strictly-smaller candidate wins, so the result is
  * deterministic in input order. Returns struct(x, y); null when
  * either line has fewer than 2 vertices or a null element.
  *
  * Registered as SQL function `graft_line_closest` via
  * [[GraftFunctions.register]].
  */
case class LineClosestExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def isLine(t: DataType): Boolean = t match {
    case ArrayType(StructType(fields), _) =>
      fields.length == 2 && fields.forall(_.dataType == DoubleType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLine(left.dataType) && isLine(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_line_closest expects two array<struct<x:double,y:double>>, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType =
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_line_closest"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LineClosestExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |InternalRow $r = graft.functions.LineClosestExpr.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LineClosestExpr {

  /** Closest point on segment (ax,ay)-(bx,by) to point (px,py) plus
    * its squared distance — same clamped-projection arithmetic as
    * [[LineDistExpr]]'s pointSegD2, extended with the realized point. */
  private def projOnSeg(px: Double, py: Double,
                        ax: Double, ay: Double, bx: Double, by: Double): (Double, Double, Double) = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val tRaw = if (len2 == 0.0) 0.0 else ((px - ax) * dx + (py - ay) * dy) / len2
    val t = math.min(math.max(tRaw, 0.0), 1.0)
    val cx = ax + t * dx; val cy = ay + t * dy
    (cx, cy, (cx - px) * (cx - px) + (cy - py) * (cy - py))
  }

  private def cross(ox: Double, oy: Double, ax: Double, ay: Double,
                    px: Double, py: Double): Double =
    (ax - ox) * (py - oy) - (ay - oy) * (px - ox)

  /** Closest point ON polyline `a` to polyline `b` as an InternalRow
    * (x, y); null when either side is degenerate. Called from
    * generated code. */
  def compute(a: ArrayData, b: ArrayData): InternalRow = {
    val na = a.numElements(); val nb = b.numElements()
    if (na < 2 || nb < 2) return null
    // flat-array staging (see LineDistExpr.flatten): the O(n·m) walk
    // must not allocate per segment pair
    val fa = LineDistExpr.flatten(a); if (fa == null) return null
    val fb = LineDistExpr.flatten(b); if (fb == null) return null
    val (axs, ays) = fa; val (bxs, bys) = fb
    val (bminx, bmaxx, bminy, bmaxy) = LineDistExpr.segBoxes(bxs, bys)
    var best = Double.MaxValue
    var bx0 = 0.0; var by0 = 0.0
    var i = 0
    var j = 0
    while (i < na - 1 && best > 0.0) {
      val p1x = axs(i); val p1y = ays(i)
      val p2x = axs(i + 1); val p2y = ays(i + 1)
      val pminx = if (p1x <= p2x) p1x else p2x
      val pmaxx = if (p1x <= p2x) p2x else p1x
      val pminy = if (p1y <= p2y) p1y else p2y
      val pmaxy = if (p1y <= p2y) p2y else p1y
      j = 0
      while (j < nb - 1 && best > 0.0) {
        // exact prune (LineDistExpr.segBoxes): a pair whose bbox gap²
        // is >= best can never strictly improve, so the
        // first-strictly-smaller argmin is unchanged
        var gx = bminx(j) - pmaxx
        val gx2 = pminx - bmaxx(j)
        if (gx2 > gx) gx = gx2
        if (gx < 0.0) gx = 0.0
        var gy = bminy(j) - pmaxy
        val gy2 = pminy - bmaxy(j)
        if (gy2 > gy) gy = gy2
        if (gy < 0.0) gy = 0.0
        if (gx * gx + gy * gy < best) {
          val q1x = bxs(j); val q1y = bys(j)
          val q2x = bxs(j + 1); val q2y = bys(j + 1)
          val o1 = cross(q1x, q1y, q2x, q2y, p1x, p1y)
          val o2 = cross(q1x, q1y, q2x, q2y, p2x, p2y)
          val o3 = cross(p1x, p1y, p2x, p2y, q1x, q1y)
          val o4 = cross(p1x, p1y, p2x, p2y, q2x, q2y)
          if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
              ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) {
            // proper crossing: solve on the LEFT segment; s in (0,1)
            // because the orientation signs are strict
            val s = o1 / (o1 - o2)
            best = 0.0
            bx0 = p1x + s * (p2x - p1x); by0 = p1y + s * (p2y - p1y)
          } else {
            val c1 = projOnSeg(p1x, p1y, q1x, q1y, q2x, q2y)
            if (c1._3 < best) { best = c1._3; bx0 = p1x; by0 = p1y }
            val c2 = projOnSeg(p2x, p2y, q1x, q1y, q2x, q2y)
            if (c2._3 < best) { best = c2._3; bx0 = p2x; by0 = p2y }
            val c3 = projOnSeg(q1x, q1y, p1x, p1y, p2x, p2y)
            if (c3._3 < best) { best = c3._3; bx0 = c3._1; by0 = c3._2 }
            val c4 = projOnSeg(q2x, q2y, p1x, p1y, p2x, p2y)
            if (c4._3 < best) { best = c4._3; bx0 = c4._1; by0 = c4._2 }
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bx0, by0))
  }
}
