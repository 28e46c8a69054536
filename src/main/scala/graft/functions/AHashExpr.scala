package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native half of the 64-bit average hash (aHash) of an 8×8 grayscale
  * raster carried as a 64-byte binary: bit i (pixel `start+i`,
  * i = 0..31) is set iff pixel·64 > Σ pixels, MSB-first packed into a
  * non-negative long.
  *
  * Bit-identical to the HOF spec twin
  * [[graft.multimodal.Multimodal.aHashHalfHof]] — including the
  * truncated-payload edge: any missing byte nulls the HOF's pixel
  * sum, every strict comparison then takes the otherwise(0) branch,
  * and the fold returns 0 (NOT null); payloads shorter than 64 bytes
  * therefore hash to 0 here too. The HOF form re-parses all 64 bytes
  * per call through interpreted substr→hex→conv; this reads them
  * once.
  *
  * Registered as SQL function `graft_ahash_half` via
  * [[GraftFunctions.register]].
  */
case class AHashHalfExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_ahash_half expects (binary, int), got ($l, $r)")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ahash_half"

  override protected def nullSafeEval(payload: Any, start: Any): Any =
    AHashHalfExpr.compute(payload.asInstanceOf[Array[Byte]], start.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, s) => s"graft.functions.AHashHalfExpr.compute($p, $s)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AHashHalfExpr {
  /** Called from generated code. */
  def compute(p: Array[Byte], start: Int): Long = {
    // the Column wrapper requires start ∈ {0, 32}, but the registered
    // SQL function is callable with anything — degrade like a
    // truncated raster instead of AIOOBE-ing the stage
    if (start < 0 || start + 32 > 64) return 0L
    if (p.length < 64) return 0L // twin: null sum → every bit's otherwise(0)
    var s = 0L
    var i = 0
    while (i < 64) { s += (p(i) & 0xff); i += 1 }
    var h = 0L
    var j = start + 31 // MSB-first over reverse(slice(ps, start+1, 32))
    while (j >= start) {
      h = h * 2 + (if ((p(j) & 0xff).toLong * 64 > s) 1L else 0L)
      j -= 1
    }
    h
  }
}

/** Native integer pixel sum of an `n`-byte raster binary. Twin of
  * [[graft.multimodal.Multimodal.rasterSumHof]]: a payload shorter
  * than `n` bytes sums to null (the HOF's out-of-range substr → null
  * propagation through the fold).
  *
  * Registered as SQL function `graft_raster_sum` via
  * [[GraftFunctions.register]].
  */
case class RasterSumExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_raster_sum expects (binary, int), got ($l, $r)")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_raster_sum"
  override def nullable: Boolean = true

  override protected def nullSafeEval(payload: Any, n: Any): Any =
    RasterSumExpr.compute(payload.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, n) => {
      val v = ctx.freshName("rsum")
      s"""
       |java.lang.Long $v = graft.functions.RasterSumExpr.compute($p, $n);
       |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
     """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RasterSumExpr {
  /** Called from generated code. */
  def compute(p: Array[Byte], n: Int): java.lang.Long = {
    if (n < 0 || p.length < n) return null
    var s = 0L
    var i = 0
    while (i < n) { s += (p(i) & 0xff); i += 1 }
    s
  }
}

/** Native sum of SQUARED pixel values of an `n`-byte raster binary —
  * the second moment that, with [[RasterSumExpr]], yields exact
  * per-channel mean/variance normalization constants. Same
  * truncation contract: payload shorter than `n` → null. Twin:
  * [[graft.multimodal.Multimodal.rasterSumSqHof]].
  *
  * Registered as SQL function `graft_raster_sumsq` via
  * [[GraftFunctions.register]].
  */
case class RasterSumSqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_raster_sumsq expects (binary, int), got ($l, $r)")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_raster_sumsq"
  override def nullable: Boolean = true

  override protected def nullSafeEval(payload: Any, n: Any): Any =
    RasterSumSqExpr.compute(payload.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, n) => {
      val v = ctx.freshName("rsumsq")
      s"""
       |java.lang.Long $v = graft.functions.RasterSumSqExpr.compute($p, $n);
       |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
     """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RasterSumSqExpr {
  /** Called from generated code. */
  def compute(p: Array[Byte], n: Int): java.lang.Long = {
    if (n < 0 || p.length < n) return null
    var s = 0L
    var i = 0
    while (i < n) { val v = (p(i) & 0xff).toLong; s += v * v; i += 1 }
    s
  }
}

/** Native sum of absolute pixel differences (SAD) between two
  * `n`-byte raster binaries — the frame-difference metric behind
  * scene-cut detection. Unsigned byte arithmetic; either payload
  * shorter than `n` → null (the [[RasterSumExpr]] truncation
  * contract). Twin: [[graft.multimodal.Multimodal.rasterSadHof]].
  *
  * Registered as SQL function `graft_raster_sad` via
  * [[GraftFunctions.register]].
  */
case class RasterSadExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_raster_sad expects (binary, binary, int), got ($a, $b, $c)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_raster_sad"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any, n: Any): Any =
    RasterSadExpr.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n) => {
      val v = ctx.freshName("rsad")
      s"""
       |java.lang.Long $v = graft.functions.RasterSadExpr.compute($a, $b, $n);
       |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
     """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RasterSadExpr {
  /** Called from generated code. */
  def compute(a: Array[Byte], b: Array[Byte], n: Int): java.lang.Long = {
    if (n < 0 || a.length < n || b.length < n) return null
    var s = 0L
    var i = 0
    while (i < n) { s += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1 }
    s
  }
}
