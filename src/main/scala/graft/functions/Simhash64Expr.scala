package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array (one md5 per token) — the
  * corpus-scale variant of [[SimhashExpr]]: 64 bits give 16-bit bands
  * under the maxHamming=3 pigeonhole split (65,536 buckets per band),
  * where the 32-bit signature's 8-bit bands (256 buckets) collapse on
  * any real crawl.
  *
  * Same bit layout extended to 16 hex chars of the digest: bit b of
  * the signature is 1 when the sum over tokens of (2*bit_b - 1) is
  * positive, bit_b read from hex char b/4 (1-indexed), bit b%4 of
  * that nibble — exactly what the DuckDB oracle replicates with
  * strpos/substr folds. Bit 63 makes the long negative, matching
  * two's-complement BIGINT in the oracle. A null token element
  * contributes -1 to every bit sum (mirrors the HOF twin
  * [[graft.dedup.Dedup.simhash64]]).
  *
  * Registered as SQL function `graft_simhash64` via
  * [[GraftFunctions.register]].
  */
case class Simhash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash64 expects array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    Simhash64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64Expr {
  /** One pass: per token, md5 → first 8 digest bytes (= 16 hex chars)
    * → 64 signed bit contributions. Called from generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 64) { sums(b) -= 1; b += 1 }
      } else {
        val digest = org.apache.commons.codec.digest.DigestUtils.md5(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
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
    while (b < 64) { if (sums(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}
