package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 32-bit SimHash over a token array (one md5 per token).
  *
  * Bit-identical to the HOF form [[graft.dedup.Dedup.simhash32]] (32
  * separate `aggregate` folds reading md5-hex nibbles), which stays as
  * its spec twin. Bit b of the signature is 1 when the sum over tokens
  * of (2*bit_b(md5(token)) - 1) is positive, where bit_b reads hex char
  * b/4 (1-indexed) of the md5 hex digest, bit b%4 of that nibble — the
  * exact layout the DuckDB oracle replicates with strpos/substr.
  *
  * A null token element contributes -1 to every bit sum, matching the
  * twin (nibble(null) → null condition → the when's otherwise(-1)
  * branch). The sums are order-independent integer adds, so one pass
  * over the array replaces 32 interpreted folds (~20× measured).
  *
  * Registered as SQL function `graft_simhash32` via
  * [[GraftFunctions.register]].
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash32 expects array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashExpr {
  /** One pass: per token, md5 → first 4 digest bytes (= first 8 hex
    * chars) → 32 signed bit contributions. Called from generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 32) { sums(b) -= 1; b += 1 }
      } else {
        val digest = org.apache.commons.codec.digest.DigestUtils.md5(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          val hexIdx = b / 4 // 0-indexed hex char position in the digest
          val by = digest(hexIdx / 2)
          val nib = if (hexIdx % 2 == 0) (by >> 4) & 0xf else by & 0xf
          sums(b) += (((nib >> (b % 4)) & 1) << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) { if (sums(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}
