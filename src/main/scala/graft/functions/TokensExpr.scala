package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: lower(text) split on `\s+`, empty
  * tokens dropped — the exact semantics of the HOF twin
  * `filter(split(lower(text), "\\s+"), t => length(t) > 0)`
  * ([[graft.text.TextAnalysis.tokensHof]]), via the same
  * UTF8String.toLowerCase / UTF8String.split the Lower and
  * StringSplit expressions use.
  *
  * Why native: the HOF filter is CodegenFallback, which ALSO excludes
  * it from whole-stage-codegen subexpression elimination — a
  * projection computing ten token-derived statistics (the Gopher
  * gate, pipe_prep_counts) re-tokenized the document ten times per
  * row. As a deterministic codegen'd expression the ten references
  * collapse to one evaluation under WSCG CSE.
  *
  * Registered as SQL function `graft_tokens` via
  * [[GraftFunctions.register]].
  */
case class TokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_tokens expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    TokensExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokensExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokensExpr {
  private val Ws = UTF8String.fromString("\\s+")

  /** Called from generated code. */
  def compute(text: UTF8String): ArrayData = {
    // identical building blocks to Lower + StringSplit(limit -1)
    val parts = text.toLowerCase.split(Ws, -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (parts(i).numBytes() > 0) n += 1; i += 1 }
    val out = new Array[Any](n)
    var k = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) { out(k) = parts(i); k += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}
