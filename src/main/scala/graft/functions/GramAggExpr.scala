package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Exact mutable accumulator for [[GramAggExpr]]: the corpus row count,
  * the per-dimension sums Σvᵢ, and the upper-triangle second-moment
  * sums Σvᵢ·vⱼ (i ≤ j, flat triangular layout). Cells accumulate in
  * primitive longs; an addition that would overflow spills the long
  * into a per-cell BigInteger ledger and restarts the long from the
  * operand — so totals are EXACT at any corpus size (the products
  * themselves use multiplyExact: a product past 2⁶³ throws loudly,
  * matching ANSI long-multiply semantics of the expression form this
  * replaces).
  */
private[functions] final class GramBuffer(val dims: Int) {
  var n: Long = 0L
  val m: Array[Long] = new Array[Long](dims)
  val mBig: Array[BigInteger] = Array.fill(dims)(BigInteger.ZERO)
  val tri: Array[Long] = new Array[Long](dims * (dims + 1) / 2)
  val triBig: Array[BigInteger] = Array.fill(dims * (dims + 1) / 2)(BigInteger.ZERO)

  @inline private def addSpill(cur: Array[Long], big: Array[BigInteger], idx: Int, v: Long): Unit = {
    val a = cur(idx)
    val sum = a + v
    // overflow iff operands share a sign the sum does not
    if (((a ^ sum) & (v ^ sum)) < 0) {
      big(idx) = big(idx).add(BigInteger.valueOf(a))
      cur(idx) = v
    } else cur(idx) = sum
  }

  def update(v: ArrayData): Unit = {
    val len = v.numElements()
    require(len <= dims,
      s"graft_gram_agg: row has $len elements, dims arg is $dims")
    n += 1
    var i = 0
    while (i < len) {
      val xi = v.getLong(i)
      addSpill(m, mBig, i, xi)
      // triangular base for row i: cells (i,i)..(i,dims-1)
      val base = i * dims - i * (i - 1) / 2
      var j = i
      while (j < len) {
        addSpill(tri, triBig, base + (j - i), Math.multiplyExact(xi, v.getLong(j)))
        j += 1
      }
      i += 1
    }
  }

  def merge(o: GramBuffer): Unit = {
    require(o.dims == dims, "graft_gram_agg: merging buffers of different dims")
    n += o.n
    var i = 0
    while (i < dims) {
      if (o.mBig(i).signum != 0) mBig(i) = mBig(i).add(o.mBig(i))
      addSpill(m, mBig, i, o.m(i))
      i += 1
    }
    i = 0
    while (i < tri.length) {
      if (o.triBig(i).signum != 0) triBig(i) = triBig(i).add(o.triBig(i))
      addSpill(tri, triBig, i, o.tri(i))
      i += 1
    }
  }

  def totalM(i: Int): BigInteger = mBig(i).add(BigInteger.valueOf(m(i)))
  def totalTri(idx: Int): BigInteger = triBig(idx).add(BigInteger.valueOf(tri(idx)))
}

/** One-pass exact Gram/moment aggregate over fp6-quantized vectors
  * (`array<long>`): returns `struct<n, m, s>` where `n` is the
  * non-null row count, `m(i) = Σ vᵢ` per dimension, and `s` is the
  * UPPER-TRIANGLE second-moment matrix `Σ vᵢ·vⱼ` (i ≤ j) in flat
  * row-major triangular order, both as exact DECIMAL(38,0).
  *
  * This replaces the explode-4096-products-per-row → hash-aggregate
  * pipeline behind the PCA covariance build: the same multiset of
  * integer products, accumulated in a tight primitive loop per row
  * (long cells with BigInteger overflow spill — see [[GramBuffer]]),
  * partial-merged per partition like any aggregate. Identical values
  * by construction: integer multiplication commutes and the
  * accumulation is exact, so regrouping cannot change a cell.
  *
  * Registered as `graft_gram_agg(qv, dims)`; `dims` must be a
  * foldable int ≥ every row's element count (rows may be shorter —
  * they contribute only their own cells, exactly like the explode
  * form did).
  */
case class GramAggExpr(
    child: Expression,
    dimsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuffer] {

  private lazy val dims: Int = dimsExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_gram_agg: dims must be a foldable int, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if dimsExpr.foldable =>
      if (dims >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_gram_agg: dims must be >= 1")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_agg expects (array<bigint>, foldable int), got ${child.dataType}")
  }

  private val D = DecimalType(38, 0)
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("m", ArrayType(D, containsNull = false), nullable = false),
    StructField("s", ArrayType(D, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_agg"

  override def children: Seq[Expression] = Seq(child, dimsExpr)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dimsExpr = newChildren(1))

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(dims)

  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: GramBuffer, other: GramBuffer): GramBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: GramBuffer): Any = {
    def dec(b: BigInteger): Decimal = Decimal(new java.math.BigDecimal(b), 38, 0)
    val m = new GenericArrayData((0 until dims).map(i => dec(buffer.totalM(i))).toArray[Any])
    val s = new GenericArrayData((0 until buffer.tri.length).map(i => dec(buffer.totalTri(i))).toArray[Any])
    new GenericInternalRow(Array[Any](buffer.n, m, s))
  }

  override def serialize(buffer: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.dims)
    out.writeLong(buffer.n)
    def writeBig(b: BigInteger): Unit = {
      val bytes = b.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    var i = 0
    while (i < buffer.dims) { writeBig(buffer.totalM(i)); i += 1 }
    i = 0
    while (i < buffer.tri.length) { writeBig(buffer.totalTri(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new GramBuffer(d)
    buf.n = in.readLong()
    def readBig(): BigInteger = {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      new BigInteger(arr)
    }
    var i = 0
    while (i < d) { buf.mBig(i) = readBig(); i += 1 }
    i = 0
    while (i < buf.tri.length) { buf.triBig(i) = readBig(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAggExpr =
    copy(inputAggBufferOffset = newOffset)
}
