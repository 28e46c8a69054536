package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native weighted-membership fold over a gram array: given
  * `grams: array<string>` and a FOLDABLE weight table
  * `array<struct<g: string, w: long>>`, returns
  * `struct<n: long, s: long>` — n = how many gram OCCURRENCES hit the
  * table, s = the exact integer sum of their weights.
  *
  * This is the map-side twin of `explode(grams) ⋈ weight-table →
  * groupBy(doc) agg(count, sum)`: identical integers (the weight per
  * matched occurrence is the same, integer addition is exact and
  * order-free), with no Generate, no join, and no corpus-sized
  * per-doc aggregation exchange. Use it when the weight table is
  * bounded (charset²-style trained models — the tables behind the
  * charlm/DSIR scores) and can ride the plan as a literal; grams
  * missing from the table are skipped, mirroring the inner join.
  * Null grams array → null result; null ELEMENTS are skipped (an
  * exploded null would not equi-join either).
  *
  * Registered as `graft_gram_wsum`.
  */
case class GramWsumExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(StructType(Array(f1, f2)), _) =>
        f1.dataType == StringType && f2.dataType == LongType
      case _ => false
    }
    if (okLeft && okRight && right.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_gram_wsum expects (array<string>, foldable array<struct<string,bigint>>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", LongType, nullable = false)))
  override def prettyName: String = "graft_gram_wsum"

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val m = new java.util.HashMap[UTF8String, java.lang.Long](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        // copy: struct accessors may return views into a shared buffer
        m.put(row.getUTF8String(0).clone(), java.lang.Long.valueOf(row.getLong(1)))
      }
      i += 1
    }
    m
  }

  override protected def nullSafeEval(grams: Any, _table: Any): Any =
    GramWsumExpr.compute(grams.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tabRef = ctx.addReferenceObj("gramWsumTable", table,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, java.lang.Long>")
    nullSafeCodeGen(ctx, ev, (grams, _) =>
      s"${ev.value} = graft.functions.GramWsumExpr.compute($grams, $tabRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GramWsumExpr {
  /** Called from generated code. */
  def compute(grams: ArrayData,
              table: java.util.HashMap[UTF8String, java.lang.Long]): GenericInternalRow = {
    var n = 0L
    var s = 0L
    var i = 0
    val len = grams.numElements()
    while (i < len) {
      if (!grams.isNullAt(i)) {
        val w = table.get(grams.getUTF8String(i))
        if (w != null) { n += 1; s += w.longValue() }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, s))
  }
}
