package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native closest-point-on-linestring: the codegen'd form of
  * graft.spatial.Geo.closestOnLineHof (segment-wise projection, min
  * candidate by (d2, seg)) — bit-identical IEEE op sequence per
  * segment, first-minimum-wins like the lexicographic `array_min`.
  *
  * Input: (line array<struct<x:double,y:double>>, px double, py
  * double); output struct<d2,seg,t,x,y>; null when the line has
  * fewer than 2 vertices.
  *
  * Reference semantics: changegen/db.py:129 (ST_ClosestPoint) and
  * generator.py:208-255 (projection parameterization).
  */
case class ClosestPointExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private val pointType = StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == DoubleType) &&
          second.dataType == DoubleType && third.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_closest_point expects (array<struct<x:double,y:double>>, double, double), " +
          s"got (${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType), StructField("seg", IntegerType),
    StructField("t", DoubleType), StructField("x", DoubleType), StructField("y", DoubleType)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_closest_point"

  override protected def nullSafeEval(lineAny: Any, pxAny: Any, pyAny: Any): Any = {
    val line = lineAny.asInstanceOf[ArrayData]
    val px = pxAny.asInstanceOf[Double]
    val py = pyAny.asInstanceOf[Double]
    val n = line.numElements()
    if (n < 2) return null
    var bestD2 = Double.MaxValue
    var bestSeg = -1
    var bestT = 0.0
    var bestX = 0.0
    var bestY = 0.0
    var i = 0
    while (i < n - 1) {
      if (line.isNullAt(i) || line.isNullAt(i + 1)) return null
      val a = line.getStruct(i, 2)
      val b = line.getStruct(i + 1, 2)
      val ax = a.getDouble(0); val ay = a.getDouble(1)
      val bx = b.getDouble(0); val by = b.getDouble(1)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      val tRaw = if (len2 == 0.0) 0.0 else ((px - ax) * dx + (py - ay) * dy) / len2
      val t = math.min(math.max(tRaw, 0.0), 1.0)
      val cx = ax + t * dx; val cy = ay + t * dy
      val d2 = (cx - px) * (cx - px) + (cy - py) * (cy - py)
      if (d2 < bestD2) { bestD2 = d2; bestSeg = i; bestT = t; bestX = cx; bestY = cy }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestD2, bestSeg, bestT, bestX, bestY))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (line, px, py) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val v = ctx.freshName("v")
      s"""
         |int $n = $line.numElements();
         |if ($n < 2) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${v}BestD2 = Double.MAX_VALUE;
         |  int ${v}BestSeg = -1;
         |  double ${v}BestT = 0.0, ${v}BestX = 0.0, ${v}BestY = 0.0;
         |  for (int $i = 0; $i < $n - 1; $i++) {
         |    if ($line.isNullAt($i) || $line.isNullAt($i + 1)) { ${ev.isNull} = true; break; }
         |    InternalRow ${v}A = $line.getStruct($i, 2);
         |    InternalRow ${v}B = $line.getStruct($i + 1, 2);
         |    double ${v}Ax = ${v}A.getDouble(0); double ${v}Ay = ${v}A.getDouble(1);
         |    double ${v}Bx = ${v}B.getDouble(0); double ${v}By = ${v}B.getDouble(1);
         |    double ${v}Dx = ${v}Bx - ${v}Ax; double ${v}Dy = ${v}By - ${v}Ay;
         |    double ${v}Len2 = ${v}Dx * ${v}Dx + ${v}Dy * ${v}Dy;
         |    double ${v}TRaw = (${v}Len2 == 0.0) ? 0.0
         |      : ((${v}Dx * ($px - ${v}Ax)) + (${v}Dy * ($py - ${v}Ay))) / ${v}Len2;
         |    double ${v}T = java.lang.Math.min(java.lang.Math.max(${v}TRaw, 0.0), 1.0);
         |    double ${v}Cx = ${v}Ax + ${v}T * ${v}Dx; double ${v}Cy = ${v}Ay + ${v}T * ${v}Dy;
         |    double ${v}D2 = (${v}Cx - $px) * (${v}Cx - $px) + (${v}Cy - $py) * (${v}Cy - $py);
         |    if (${v}D2 < ${v}BestD2) {
         |      ${v}BestD2 = ${v}D2; ${v}BestSeg = $i; ${v}BestT = ${v}T;
         |      ${v}BestX = ${v}Cx; ${v}BestY = ${v}Cy;
         |    }
         |  }
         |  InternalRow $row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{${v}BestD2, ${v}BestSeg, ${v}BestT, ${v}BestX, ${v}BestY});
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
