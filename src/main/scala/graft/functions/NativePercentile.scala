package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Open-addressing Double→Long count map on two primitive arrays — zero
  * boxing on the per-row hot path (the built-in `Percentile` buffers into a
  * boxed-key map). `count == 0` marks an empty slot: a present key's count
  * is always ≥ 1, and NULL inputs never reach the map.
  */
final class DoubleCounts(initialCapacity: Int = 1 << 10) extends Serializable {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2 - 1)
  private var keys = new Array[Double](cap)
  private var cnts = new Array[Long](cap)
  private var used = 0

  private def slot(k: Double): Int = {
    // Hash AND probe on doubleToLongBits so they agree: primitive `!=`
    // would conflate -0.0 with 0.0 (hashed to different slots → probe-order-
    // dependent merging) and never match NaN (a fresh slot per NaN input).
    // Bits equality = boxed java.lang.Double.equals — -0.0/0.0 distinct, all
    // NaNs one key — matching the built-in Percentile's boxed-key map.
    val h = java.lang.Double.doubleToLongBits(k)
    var x = h ^ (h >>> 33); x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
    var i = x.toInt & (cap - 1)
    while (cnts(i) != 0 && java.lang.Double.doubleToLongBits(keys(i)) != h)
      i = (i + 1) & (cap - 1)
    i
  }

  def add(k: Double, c: Long): Unit = {
    val i = slot(k)
    if (cnts(i) == 0) { keys(i) = k; used += 1 }
    cnts(i) += c
    if (used.toLong * 10 > cap.toLong * 7) grow()
  }

  private def grow(): Unit = {
    val ok = keys; val oc = cnts
    cap <<= 1
    keys = new Array[Double](cap); cnts = new Array[Long](cap); used = 0
    var i = 0
    while (i < ok.length) {
      if (oc(i) != 0) { val j = slot(ok(i)); keys(j) = ok(i); cnts(j) = oc(i); used += 1 }
      i += 1
    }
  }

  def size: Int = used

  /** (keys, counts) of the occupied slots, unordered. */
  def pairs: (Array[Double], Array[Long]) = {
    val ks = new Array[Double](used); val cs = new Array[Long](used)
    var i = 0; var o = 0
    while (i < cap) {
      if (cnts(i) != 0) { ks(o) = keys(i); cs(o) = cnts(i); o += 1 }
      i += 1
    }
    (ks, cs)
  }
}

/** Exact interpolated percentiles as a native `TypedImperativeAggregate`:
  * identical results to the built-in `percentile` (same position/
  * interpolation arithmetic, proven bit-equal in OperatorsSpec), but the
  * per-row path is a primitive open-addressing map update — no boxing, no
  * generic-map churn. Returns `array<double>`, one element per requested
  * percentage; NULL on an empty/all-NULL group, like the built-in.
  *
  * Memory is bounded by distinct values per group per partition, the same
  * bound as the built-in; for value multisets beyond memory use
  * `operators.Quantiles.quantileCont` (shuffle-based) instead.
  */
case class PercentileArray(
    child: Expression,
    percentages: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleCounts] {

  require(percentages.forall(p => p >= 0.0 && p <= 1.0), "percentages must be in [0, 1]")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"percentile_array requires double input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "percentile_array"

  override def createAggregationBuffer(): DoubleCounts = new DoubleCounts()

  override def update(buf: DoubleCounts, input: InternalRow): DoubleCounts = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1L)
    buf
  }

  override def merge(buf: DoubleCounts, other: DoubleCounts): DoubleCounts = {
    val (ks, cs) = other.pairs
    var i = 0
    while (i < ks.length) { buf.add(ks(i), cs(i)); i += 1 }
    buf
  }

  override def eval(buf: DoubleCounts): Any = {
    if (buf.size == 0) return null
    val (ks, cs) = buf.pairs
    // sort pairs by key (indices sorted on boxed keys — eval-time only,
    // once per group, over distinct values)
    val order = Array.range(0, ks.length)
      .sortBy(i => ks(i))
    val sortedKeys = order.map(ks(_))
    val cum = new Array[Long](order.length)
    var total = 0L
    var i = 0
    while (i < order.length) { total += cs(order(i)); cum(i) = total; i += 1 }

    // value at 0-based index j = first sorted key whose cumulative count > j
    def valueAt(j: Long): Double = {
      var lo = 0; var hi = cum.length - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) > j) hi = mid else lo = mid + 1
      }
      sortedKeys(lo)
    }

    val out = percentages.map { p =>
      val position = p * (total - 1)
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerKey = valueAt(lower)
      if (higher == lower) lowerKey
      else {
        val higherKey = valueAt(higher)
        if (higherKey == lowerKey) lowerKey
        else (higher - position) * lowerKey + (position - lower) * higherKey
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: DoubleCounts): Array[Byte] = {
    val (ks, cs) = buf.pairs
    val bb = ByteBuffer.allocate(4 + ks.length * 16)
    bb.putInt(ks.length)
    var i = 0
    while (i < ks.length) { bb.putDouble(ks(i)); bb.putLong(cs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleCounts = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new DoubleCounts(math.max(16, n * 2))
    var i = 0
    while (i < n) { m.add(bb.getDouble, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileArray =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileArray =
    copy(inputAggBufferOffset = newOffset)
}

object NativeAgg {
  /** Register the SQL form: percentile_array(col, 'p1,p2,...'). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def litStr(e: Expression): String = e match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => sys.error(s"expected string literal, got $other")
    }
    reg.createOrReplaceTempFunction(
      "percentile_array",
      exprs => PercentileArray(
        Cast(exprs(0), DoubleType),
        litStr(exprs(1)).split(',').toSeq.map(_.trim.toDouble)),
      "built-in")
  }

  def percentileArray(c: Column, ps: Seq[Double]): Column = {
    RegisterOnce("percentile_array")(register)
    org.apache.spark.sql.functions.call_function(
      "percentile_array", c, org.apache.spark.sql.functions.lit(ps.mkString(",")))
  }
}
