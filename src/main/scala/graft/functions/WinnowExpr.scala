package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * SIGMOD 2003; the MOSS algorithm): over the token array's word
  * `n`-gram hash sequence, slide a window of `w` consecutive hashes
  * and select each window's MINIMUM (ties → the RIGHTMOST
  * occurrence, the paper's rule); the distinct selected (position,
  * hash) pairs are the document's fingerprints. Winnowing guarantees
  * a fingerprint in every w-window — any shared substring of
  * ≥ n + w − 1 tokens between two documents yields at least one
  * shared fingerprint — while sampling only ~2/(w+1) of the grams:
  * the position-robust LOCAL fingerprint family, complementary to
  * [[CdcCutsExpr]]'s content-defined byte chunking.
  *
  * Gram hash = the 60-bit md5 prefix ([[Md5Long60Expr]]) of the
  * space-joined gram — the same key the shingle-join family
  * shuffles, and the same 15-nibble fold the DuckDB oracle
  * replicates. One pass, monotonic-deque sliding minimum (pop-≥ on
  * push, so later equal hashes displace earlier — rightmost-min for
  * free); O(#grams) total, never O(#grams · w).
  *
  * Returns array<struct<pos int, fp bigint>> ordered by pos
  * (1-based gram index), one entry per distinct selected position —
  * a selected position persists across consecutive windows, so
  * consecutive-dedup IS distinct. Fewer grams than `w` → one window
  * over what's there; zero grams (shorter than n tokens) → empty
  * array; null tokens / non-positive n or w → null.
  *
  * Registered as SQL function `graft_winnow` via
  * [[GraftFunctions.register]].
  */
case class WinnowExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow expects (array<string>, int, int), got ($a, $b, $c)")
    }

  override def dataType: DataType =
    ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_winnow"
  override def nullable: Boolean = true

  override protected def nullSafeEval(toks: Any, n: Any, w: Any): Any =
    WinnowExpr.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, w) => s"""
       |${ev.value} = graft.functions.WinnowExpr.compute($t, $n, $w);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowExpr {
  /** Called from generated code. */
  def compute(toks: ArrayData, n: Int, w: Int): ArrayData = {
    if (n < 1 || w < 1) return null
    val nt = toks.numElements()
    val ng = nt - n + 1
    if (ng <= 0) return new GenericArrayData(Array.empty[Any])
    // gram hashes: space-joined n-token windows → 60-bit md5 prefix.
    // Null token elements are SKIPPED along with their separator —
    // concat_ws semantics, matching graft_word_ngrams / the HOF twin
    // (the tokenizer never emits nulls in practice).
    val sb = new java.lang.StringBuilder
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      var j = 0
      var appended = false // sb.length can't tell "" apart from nothing
      while (j < n) {
        if (!toks.isNullAt(i + j)) {
          if (appended) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          appended = true
        }
        j += 1
      }
      hs(i) = Md5Long60Expr.compute(UTF8String.fromString(sb.toString))
      i += 1
    }
    // monotonic deque of gram indices, hash strictly increasing front
    // to back; pushing pops every back entry with hash >= h(j), so an
    // equal later hash replaces the earlier one — rightmost-min.
    val deque = new Array[Int](ng)
    var head = 0
    var tail = 0 // exclusive
    val outPos = new Array[Int](ng)
    val outFp = new Array[Long](ng)
    var nOut = 0
    var g = 0
    while (g < ng) {
      while (tail > head && hs(deque(tail - 1)) >= hs(g)) tail -= 1
      deque(tail) = g; tail += 1
      // first full window ends at gram w-1 (or at ng-1 when ng < w)
      val winEnd = g
      val winStart = winEnd - w + 1
      if (winEnd >= math.min(w, ng) - 1) {
        while (deque(head) < winStart) head += 1
        val sel = deque(head)
        if (nOut == 0 || outPos(nOut - 1) != sel + 1) {
          outPos(nOut) = sel + 1 // 1-based, matching the oracle
          outFp(nOut) = hs(sel)
          nOut += 1
        }
      }
      g += 1
    }
    val rows = new Array[Any](nOut)
    var r = 0
    while (r < nOut) { rows(r) = InternalRow(outPos(r), outFp(r)); r += 1 }
    new GenericArrayData(rows)
  }
}
