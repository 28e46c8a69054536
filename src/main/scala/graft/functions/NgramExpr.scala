package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native char n-gram builder: all `n`-char grams of `text` in order,
  * empty array when the text is shorter than `n` chars.
  *
  * Bit-identical to the HOF spec twin (`transform(sequence(1, len-n+1),
  * i => text.substr(i, n))` behind a short-text guard —
  * [[graft.text.TextAnalysis.charTrigramsHof]] for n = 3): character
  * (not byte) offsets via the same substringSQL the Substring
  * expression uses. The HOF chain is CodegenFallback and pays
  * per-gram interpreted dispatch; this emits the array in one pass.
  *
  * Registered as SQL function `graft_char_ngrams` via
  * [[GraftFunctions.register]].
  */
case class CharNgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams expects (string, int), got ($l, $r)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"
  override def nullable: Boolean = true

  override protected def nullSafeEval(text: Any, n: Any): Any =
    CharNgramsExpr.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => s"""
       |${ev.value} = graft.functions.CharNgramsExpr.compute($t, $n);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharNgramsExpr {
  /** Called from generated code. One pass over the bytes: char-start
    * byte offsets are computed once (numBytesForFirstByte — the same
    * walk UTF8String's own substring uses), then every gram is a
    * direct byte-range copy. substringSQL per gram would re-walk from
    * byte 0 each call — O(len²) on long documents. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (n < 1) return null
    val bytes = text.getBytes
    // byte offset of each char start, plus the end sentinel
    val offs = new Array[Int](text.numChars() + 1)
    var c = 0
    var b = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(c) = bytes.length
    val len = c
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i < len - n + 1) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native word n-gram builder over a token array: space-joined windows
  * of `n` tokens. Two window modes, matching the two HOF shapes in the
  * dedup family:
  *
  *   - `partial = 0`: full windows only, start positions 1..size-n+1
  *     stepping `step`; size < n → empty (the [[graft.dedup.Dedup]]
  *     shingle / dupNgramStats shape).
  *   - `partial = 1`: start positions 0, step, 2·step… ≤ max(size-1,0)
  *     (0-based), each window taking up to `n` tokens — tail windows
  *     are shorter, and an EMPTY token array yields one "" window
  *     (the segmentDedup `sequence(0, greatest(size-1,0), step)`
  *     shape, exactly).
  *
  * Null tokens are skipped inside a window (concat_ws semantics).
  * Bit-identical to the HOF twins (`transform(sequence(...),
  * i => concat_ws(" ", slice(toks, i, n)))`), which stay for
  * bit-equality specs.
  *
  * Registered as SQL function `graft_word_ngrams` via
  * [[GraftFunctions.register]].
  */
case class WordNgramsExpr(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"graft_word_ngrams expects (array<string>, int, int, int), got ($a, $b, $c, $d)")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"
  override def nullable: Boolean = true

  override protected def nullSafeEval(toks: Any, n: Any, step: Any, partial: Any): Any =
    WordNgramsExpr.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int],
      step.asInstanceOf[Int], partial.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n, s, p) => s"""
       |${ev.value} = graft.functions.WordNgramsExpr.compute($a, $n, $s, $p);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object WordNgramsExpr {
  private val Space = UTF8String.fromString(" ")

  /** Called from generated code. */
  def compute(toks: ArrayData, n: Int, step: Int, partial: Int): ArrayData = {
    if (n < 1 || step < 1) return null
    val size = toks.numElements()
    val starts0: Array[Int] =
      if (partial == 0) {
        if (size < n) return new GenericArrayData(Array.empty[Any])
        Array.range(0, size - n + 1, step)
      } else {
        // sequence(0, greatest(size-1, 0), step): size = 0 still emits
        // start 0 → one "" window (slice of an empty array)
        Array.range(0, math.max(size - 1, 0) + 1, step)
      }
    val out = new Array[Any](starts0.length)
    var w = 0
    while (w < starts0.length) {
      val s = starts0(w)
      val end = math.min(s + n, size)
      var count = 0
      var j = s
      while (j < end) { if (!toks.isNullAt(j)) count += 1; j += 1 }
      val parts = new Array[UTF8String](count)
      var k = 0
      j = s
      while (j < end) {
        if (!toks.isNullAt(j)) { parts(k) = toks.getUTF8String(j); k += 1 }
        j += 1
      }
      out(w) = UTF8String.concatWs(Space, parts: _*)
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Native MinHash signature over a shingle array: `numPerm` longs,
  * element j = min over shingles of ((u32(md5(s)) · A_j + B_j) mod P)
  * with the constants from [[graft.dedup.Dedup]] (u32 = first 8 hex
  * chars of the md5 = first 4 digest bytes big-endian).
  *
  * Bit-identical to the HOF twin [[graft.dedup.Dedup.minhashHof]]
  * (one interpreted transform materializing md5-hex strings +
  * conv-base-16 parses, then numPerm array_min passes); this hashes
  * each shingle once and folds all permutations in the same pass. A
  * null shingle is skipped (array_min ignores null); an empty or
  * all-null shingle array yields null signature elements.
  *
  * Registered as SQL function `graft_minhash` via
  * [[GraftFunctions.register]].
  */
case class MinhashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<string>, int), got ($l, $r)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true

  override protected def nullSafeEval(shingles: Any, numPerm: Any): Any =
    MinhashExpr.compute(shingles.asInstanceOf[ArrayData], numPerm.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p) => s"""
       |${ev.value} = graft.functions.MinhashExpr.compute($a, $p);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinhashExpr {
  // the permutation constants as flat arrays — Dedup.MinhashA is a
  // Seq (O(j) apply) and minhashB a per-call recomputation; this loop
  // is the per-shingle×per-perm hot path
  private val A: Array[Long] = graft.dedup.Dedup.MinhashA.toArray
  private val B: Array[Long] = Array.tabulate(A.length)(graft.dedup.Dedup.minhashB)

  /** Called from generated code. */
  def compute(shingles: ArrayData, numPerm: Int): ArrayData = {
    if (numPerm < 0 || numPerm > A.length) return null
    val p = graft.dedup.Dedup.MinhashP
    val n = shingles.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val d = org.apache.commons.codec.digest.DigestUtils.md5(shingles.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < numPerm) {
          val v = (h * A(j) + B(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](numPerm)(null))
    else UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
