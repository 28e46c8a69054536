package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native PCM sample decode of a canonical 16-bit WAV payload:
  * `array<int>` of all samples, NULL for non-WAV / non-16-bit payloads
  * (the drop-row malformed-input contract), a null ELEMENT where a
  * sample's bytes run past a truncated payload.
  *
  * Semantics are bit-identical to the HOF spec twin
  * [[graft.multimodal.Multimodal.wavPcm16Hof]] (transform over a
  * sequence of per-sample substr/hex/conv reads). The difference is
  * mechanical: the HOF chain is CodegenFallback and pays a per-BYTE
  * interpreted substr→hex-string→base-16-parse round trip (~30 µs per
  * sample measured — 9.5M samples at sf0.1 took the mm_audio_seg
  * query to 122 s), while this walks the byte array once in a
  * primitive loop inside whole-stage codegen.
  *
  * Registered as SQL function `graft_wav_pcm16` via
  * [[GraftFunctions.register]].
  */
case class WavPcm16Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_wav_pcm16 expects binary, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "graft_wav_pcm16"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WavPcm16Expr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.WavPcm16Expr.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavPcm16Expr {
  private def eq4(p: Array[Byte], off: Int, m: String): Boolean =
    p.length >= off + 4 && p(off) == m.charAt(0).toByte && p(off + 1) == m.charAt(1).toByte &&
      p(off + 2) == m.charAt(2).toByte && p(off + 3) == m.charAt(3).toByte

  /** Called from generated code. Returns null (not-a-decodable-WAV),
    * an empty array (zero-length or unreadable data-size field), or
    * the sample array (null-padded where the payload is truncated
    * mid-sample — exactly the HOF twin's out-of-range substr → null
    * propagation). */
  def compute(p: Array[Byte]): ArrayData = {
    // canonical-layout gate, identical to Multimodal.isWav
    if (!eq4(p, 0, "RIFF") || !eq4(p, 8, "WAVE") || !eq4(p, 12, "fmt ") || !eq4(p, 36, "data"))
      return null
    // bits-per-sample: little-endian u16 at 0-based 34 (present: the
    // "data" magic check above guarantees length ≥ 40)
    if (((p(34) & 0xff) | ((p(35) & 0xff) << 8)) != 16) return null
    // declared data size: little-endian u32 at 0-based 40, truncation-
    // aware like the twin's concat-of-per-byte-hex (missing high bytes
    // contribute nothing; all four missing → conv("") → no sample loop)
    var dataBytes = 0L
    var have = 0
    var k = 43
    while (k >= 40) {
      if (k < p.length) { dataBytes = (dataBytes << 8) | (p(k) & 0xff); have += 1 }
      k -= 1
    }
    val n = (dataBytes >> 1).toInt
    if (have == 0 || n <= 0) return new GenericArrayData(Array.empty[Any])
    // mirror sequence()'s array-length ceiling: the HOF twin throws
    // past it, and allocating a near-2³¹ null-padded tail from a
    // corrupt 44-byte header would OOM the executor instead
    if (n > Int.MaxValue - 15)
      throw new IllegalArgumentException(
        s"graft_wav_pcm16: declared sample count $n exceeds the max array length")
    val out = new Array[Int](n)
    var nulls: Array[Boolean] = null
    var i = 0
    while (i < n) {
      val o = 44 + 2 * i // 0-based low byte (1-based 45+2i)
      if (o + 1 < p.length) {
        val u = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
        out(i) = if (u >= 32768) u - 65536 else u
      } else {
        if (nulls == null) nulls = new Array[Boolean](n)
        nulls(i) = true
      }
      i += 1
    }
    if (nulls == null) UnsafeArrayData.fromPrimitiveArray(out)
    else {
      val boxed = new Array[Any](n)
      var j = 0
      while (j < n) { if (!nulls(j)) boxed(j) = out(j); j += 1 }
      new GenericArrayData(boxed)
    }
  }
}

/** Native one-pass loudness stats over a decoded PCM array:
  * struct(n_samples, peak, sum_sq) with the exact fold semantics of
  * the three separate HOF aggregates mm_audio_rms used — peak =
  * fold(greatest(acc, abs(v))) which SKIPS null samples (greatest
  * ignores null), sum_sq = fold(acc + v²) which NULLS on the first
  * null sample, n_samples = size. One pass instead of three
  * interpreted folds.
  *
  * Registered as SQL function `graft_pcm_stats` via
  * [[GraftFunctions.register]].
  */
case class PcmStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pcm_stats expects array<int>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = true)))
  override def prettyName: String = "graft_pcm_stats"
  override def nullable: Boolean = true

  override protected def nullSafeEval(pcm: Any): Any =
    PcmStatsExpr.compute(pcm.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.PcmStatsExpr.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmStatsExpr {
  /** Called from generated code. */
  def compute(pcm: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = pcm.numElements()
    var peak = 0L
    var sumSq = 0L
    var sumNull = false
    var i = 0
    while (i < n) {
      if (pcm.isNullAt(i)) sumNull = true
      else {
        val v = pcm.getInt(i).toLong
        // abs on the INT first, like the HOF's abs(IntegerType): for
        // Int.MinValue (outside any real PCM range but reachable via
        // the SQL surface) it wraps negative and greatest skips it —
        // widening first would diverge from the documented twin
        val a = math.abs(pcm.getInt(i)).toLong
        if (a > peak) peak = a
        sumSq += v * v
      }
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    row.update(0, n.toLong)
    row.update(1, peak)
    if (sumNull) row.setNullAt(2) else row.update(2, sumSq)
    row
  }
}

/** Native exact per-frame energies over a decoded PCM array:
  * non-overlapping `frameLen`-sample frames, energy = Σ v² in BIGINT,
  * trailing partial frame dropped; fewer than `frameLen` samples →
  * empty; a null sample nulls its frame's energy (the twin's
  * null-propagating fold); null pcm propagates.
  *
  * Bit-identical to the HOF spec twin
  * [[graft.multimodal.Multimodal.pcmFrameEnergiesHof]] (transform over
  * frame indices, aggregate over each slice), replacing the
  * interpreted nested fold with one primitive pass.
  *
  * Registered as SQL function `graft_frame_energies` via
  * [[GraftFunctions.register]].
  */
case class PcmFrameEnergiesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_frame_energies expects (array<int>, int), got ($l, $r)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_frame_energies"
  override def nullable: Boolean = true

  override protected def nullSafeEval(pcm: Any, fl: Any): Any =
    PcmFrameEnergiesExpr.compute(pcm.asInstanceOf[ArrayData], fl.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = graft.functions.PcmFrameEnergiesExpr.compute($a, $b);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PcmFrameEnergiesExpr {
  /** Called from generated code. */
  def compute(pcm: ArrayData, frameLen: Int): ArrayData = {
    if (frameLen < 1) return null
    val n = pcm.numElements()
    if (n < frameLen) return new GenericArrayData(Array.empty[Any])
    val nf = n / frameLen
    val out = new Array[Long](nf)
    var nulls: Array[Boolean] = null
    var f = 0
    while (f < nf) {
      var e = 0L
      var anyNull = false
      var j = f * frameLen
      val end = j + frameLen
      while (j < end) {
        if (pcm.isNullAt(j)) anyNull = true
        else { val v = pcm.getInt(j).toLong; e += v * v }
        j += 1
      }
      if (anyNull) {
        if (nulls == null) nulls = new Array[Boolean](nf)
        nulls(f) = true
      } else out(f) = e
      f += 1
    }
    if (nulls == null) UnsafeArrayData.fromPrimitiveArray(out)
    else {
      val boxed = new Array[Any](nf)
      var g = 0
      while (g < nf) { if (!nulls(g)) boxed(g) = out(g); g += 1 }
      new GenericArrayData(boxed)
    }
  }
}
