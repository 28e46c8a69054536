package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass content-defined-chunking cut finder: the chunk
  * BOUNDS array `[0, cut₁, cut₂, …, n]` (n = char length) where a
  * char position i ∈ [window, n-1] is a cut iff the md5 of the
  * `window`-char run ending at i has its first 8 hex chars, read as a
  * uint32, ≡ 0 mod `divisor`.
  *
  * Bit-identical to the composable HOF form
  * `filter(sequence(window, n-1), i -> conv(substring(md5(substr(txt,
  * i-window+1, window)), 1, 8), 16, 10) % divisor = 0)` — which the
  * DuckDB oracle replicates — but ~an order of magnitude cheaper per
  * position: that form materializes a window substring, a 32-char hex
  * string, an 8-char slice, and a string→long parse PER CHARACTER of
  * every document. Here one pass walks the char byte-offsets, feeds
  * the raw window bytes to a reused MD5 instance, and reads the probe
  * value from the first 4 digest bytes — no hex, no parsing, no
  * per-probe allocation beyond the digest.
  *
  * Registered as SQL function `graft_cdc_cuts(text, window, divisor)`
  * via [[GraftFunctions.register]]; `window`/`divisor` are literal
  * ints (the chunking config, not data).
  */
case class CdcCutsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_cuts expects (string, int, int), got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(txt: Any, window: Any, divisor: Any): Any =
    CdcCutsExpr.compute(txt.asInstanceOf[UTF8String],
      window.asInstanceOf[Int], divisor.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, d) =>
      s"${ev.value} = graft.functions.CdcCutsExpr.compute($t, $w, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcCutsExpr {
  /** One pass over the string: char byte-offsets walked once, then per
    * probe position an md5 over the raw window bytes. Called from
    * generated code. */
  def compute(txt: UTF8String, window: Int, divisor: Int): ArrayData = {
    require(window >= 1 && divisor >= 1,
      s"graft_cdc_cuts: need window >= 1 and divisor >= 1, got ($window, $divisor)")
    val bytes = txt.getBytes
    // byte offset of each char start, plus the end sentinel — one walk
    val nBytes = bytes.length
    var nChars = 0
    var off = 0
    while (off < nBytes) {
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    val offsets = new Array[Int](nChars + 1)
    off = 0
    var c = 0
    while (off < nBytes) {
      offsets(c) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      c += 1
    }
    offsets(nChars) = nBytes
    // probe positions i ∈ [window, nChars-1]: md5 over the bytes of
    // chars [i-window, i) — the window-char run ending AT i, matching
    // substr(i-window+1, window) in the HOF/oracle form
    val md = java.security.MessageDigest.getInstance("MD5")
    val cuts = new java.util.ArrayList[Integer]
    var i = window
    while (i < nChars) {
      val from = offsets(i - window)
      md.update(bytes, from, offsets(i) - from)
      val digest = md.digest() // resets the instance
      val probe = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      if (probe % divisor == 0) cuts.add(i)
      i += 1
    }
    val bounds = new Array[Int](cuts.size + 2)
    bounds(0) = 0
    var j = 0
    while (j < cuts.size) { bounds(j + 1) = cuts.get(j); j += 1 }
    bounds(cuts.size + 1) = nChars
    new GenericArrayData(bounds)
  }
}
