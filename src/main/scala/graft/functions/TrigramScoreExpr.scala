package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native char-trigram profile score: the number of 3-codepoint
  * substrings of the input that occur in a (foldable) profile array —
  * the hot inner loop of Cavnar–Trenkle-style language ID.
  *
  * Semantically identical to the HOF twin
  * [[graft.text.TextAnalysis.trigramScore]] (build grams via
  * `transform(sequence(...), i -> substr(i,3))`, filter by `isin`,
  * `size`), which stays for the bit-equality spec. The HOF form is
  * interpreted and each `substr` is O(position) on UTF-8, so scoring
  * is O(n²) per row per profile; this is one O(n) pass over the
  * codepoints with a hash-set membership probe.
  *
  * The input should already be lowercased IN SPARK (`lower(text)`) so
  * case folding stays engine-consistent; this expression does no case
  * mapping. Registered as `graft_trigram_score`.
  */
case class TrigramScoreExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
        (right.dataType match { case ArrayType(StringType, _) => true; case _ => false }) &&
        right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_trigram_score expects (string, foldable array<string>), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_trigram_score"

  @transient private lazy val profileSet: java.util.HashSet[String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String]()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).toString)
      i += 1
    }
    s
  }

  override protected def nullSafeEval(text: Any, profile: Any): Any =
    TrigramScoreExpr.compute(text.asInstanceOf[UTF8String], profileSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("profileSet", profileSet, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = graft.functions.TrigramScoreExpr.compute($text, $setRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TrigramScoreExpr {
  /** One pass over the string's CODEPOINTS (matching Spark substr
    * semantics, not UTF-16 units). Called from generated code. */
  def compute(text: UTF8String, profile: java.util.HashSet[String]): Int = {
    val str = text.toString
    val len = str.length
    // codepoint start offsets (UTF-16 indices); n = codepoint count
    var n = 0
    var off = 0
    val offsets = new Array[Int](len + 1)
    while (off < len) {
      offsets(n) = off
      off += Character.charCount(str.codePointAt(off))
      n += 1
    }
    offsets(n) = len
    if (n < 3) return 0
    var c = 0
    var i = 0
    while (i <= n - 3) {
      if (profile.contains(str.substring(offsets(i), offsets(i + 3)))) c += 1
      i += 1
    }
    c
  }
}
