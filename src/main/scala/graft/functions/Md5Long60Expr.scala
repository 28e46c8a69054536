package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5 key: the first 15 hex chars of md5(s) as a BIGINT —
  * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` (and to
  * the DuckDB 15-nibble strpos/substr fold the oracles use), but
  * computed straight from the digest bytes: no hex-encode of the
  * digest, no string-parse back. The composable form pays a 32-char
  * hex materialization plus a radix parse PER ROW just to throw 17 of
  * the 32 chars away; here the value is the first 8 digest bytes as a
  * big-endian long, logically shifted right 4 (drop the 16th nibble),
  * so the result is non-negative and fits a signed BIGINT.
  *
  * This is the shuffle-key maker for the shingle-join family
  * ([[graft.dedup.Dedup.shingleKey]]): joins and count-windows
  * partition on this 8-byte long instead of the raw n-word shingle
  * string, so exchanges carry ~4× fewer bytes and the sort compares
  * longs. 60 bits ≡ collision odds ~n²/2^61 — deterministic and
  * mirrored by the oracle, so a collision cannot hash-mismatch.
  *
  * Registered as SQL function `graft_md5_long60` via
  * [[GraftFunctions.register]].
  */
case class Md5Long60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_md5_long60 expects string, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_long60"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    Md5Long60Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long60Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Long60Expr {
  /** First 8 md5 digest bytes as big-endian long, >>> 4 — the first
    * 15 hex nibbles as an unsigned 60-bit value. Called from
    * generated code. */
  def compute(s: UTF8String): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}
