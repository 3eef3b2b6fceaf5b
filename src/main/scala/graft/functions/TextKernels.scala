package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the text-fingerprinting hot path. The array-
  * expression formulations (transform/aggregate over shingles) are
  * interpreted per element; these run the whole per-document loop in
  * compiled Scala, invoked from generated code via a kernel reference —
  * the same per-row cost model as Spark's own string expressions.
  */
object TextKernels {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** Lowercase hex md5 of a string's UTF-8 bytes — identical to Spark/DuckDB md5(). */
  def md5Hex(s: String): String = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Word n-gram shingles of a single-space-separated text; semantics equal
    * to `transform(sequence(...), i -> concat_ws(" ", w[i..i+n-1]))` over
    * `split(text, " ")` (trailing empties kept, like Spark/DuckDB split).
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val w = text.toString.split(" ", -1)
    val cnt = w.length - (n - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(w(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Non-overlapping occurrence counts of each marker over the space-padded
    * lowercase of `text` — one compiled pass, zero intermediate strings
    * besides the padded copy. Count semantics are identical to the portable
    * `(length(t) - length(replace(t, m, ''))) / length(m)` trick (both are
    * left-to-right non-overlapping scans), so results match the SQL oracle
    * bit-for-bit. Lowercasing goes through UTF8String.toLowerCase — the same
    * code path as Spark's `lower()`.
    */
  def markerCounts(text: UTF8String, markers: Array[String]): ArrayData = {
    if (text == null) return null
    val t = " " + text.toLowerCase.toString + " "
    val out = new Array[Any](markers.length)
    var i = 0
    while (i < markers.length) {
      val m = markers(i)
      var cnt = 0L
      var idx = t.indexOf(m)
      while (idx >= 0) { cnt += 1; idx = t.indexOf(m, idx + m.length) }
      out(i) = cnt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash fingerprint of a single-space-separated text as a
    * '0'/'1' string — one compiled pass: per word, one md5 over the word's
    * UTF-8 bytes, 32 integer bit-votes taken straight from the first four
    * digest bytes. Bit j's vote = ((hexNibble(j/4) >> (j%4)) & 1)*2-1,
    * identical to the staged `conv(substring(md5hex, 1+j/4, 1))` vote math
    * in the SQL oracle and the explode+aggregate formulation.
    */
  def simhash32(text: UTF8String): UTF8String = {
    if (text == null) return null
    val words = text.toString.split(" ", -1)
    val votes = new Array[Int](32)
    val d = md5.get()
    var wi = 0
    while (wi < words.length) {
      d.reset()
      val dig = d.digest(words(wi).getBytes("UTF-8"))
      var j = 0
      while (j < 32) {
        val q = j >> 2                                     // hex nibble index
        val b = dig(q >> 1) & 0xff
        val nb = if ((q & 1) == 0) (b >>> 4) & 0xf else b & 0xf
        votes(j) += (((nb >> (j & 3)) & 1) << 1) - 1
        j += 1
      }
      wi += 1
    }
    val out = new Array[Char](32)
    var j = 0
    while (j < 32) { out(j) = if (votes(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromString(new String(out))
  }

  /** MinHash signature from shingles: numHashes/4 md5 calls per shingle
    * (seed-prefixed), each yielding four 32-bit hex slices; element i of the
    * result is min over shingles of slice i%4 of md5("(i/4)|shingle").
    * Equal to the staged array-expression formulation in MinHashLsh.
    */
  def minhashSlices(shingleArr: ArrayData, numHashes: Int): ArrayData = {
    if (shingleArr == null) return null
    val nMd5 = numHashes / 4
    val mins = new Array[String](numHashes)
    val n = shingleArr.numElements()
    var si = 0
    while (si < n) {
      val s = shingleArr.getUTF8String(si).toString
      var seed = 0
      while (seed < nMd5) {
        val hex = md5Hex(seed.toString + "|" + s)
        var slice = 0
        while (slice < 4) {
          val sub = hex.substring(8 * slice, 8 * slice + 8)
          val idx = seed * 4 + slice
          if (mins(idx) == null || sub.compareTo(mins(idx)) < 0) mins(idx) = sub
          slice += 1
        }
        seed += 1
      }
      si += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)): Array[Any])
  }

  /** MinHash signature via seeded XXH64 — the production hash family: one
    * 64-bit xxhash per (seed, shingle), computed straight over the
    * shingle's UTF-8 bytes with the seed as the XXH64 seed parameter (no
    * hex rendering, no digest allocation, no string concat per hash).
    * Output is `array<long>` of per-seed minima (signed-long order).
    *
    * The md5 slice family above stays the ORACLE family: DuckDB 1.0 has no
    * xxhash64 SQL function (verified round 2), so cross-engine pairs pin
    * md5; engine-only callers pick this one for speed.
    */
  def minhashXx(shingleArr: ArrayData, numHashes: Int): ArrayData = {
    if (shingleArr == null) return null
    val n = shingleArr.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var si = 0
    while (si < n) {
      val s = shingleArr.getUTF8String(si)
      var seed = 0
      while (seed < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      si += 1
    }
    new GenericArrayData(mins.map(Long.box): Array[Any])
  }
}

/** Serializable handle for generated code: the kernel object itself holds a
  * non-serializable ThreadLocal digest, so plans reference this stateless
  * forwarder instead (the object is class-loaded fresh on each executor).
  */
class TextKernelsRef extends Serializable {
  def shingles(t: UTF8String, n: Int): ArrayData = TextKernels.shingles(t, n)
  def minhashSlices(a: ArrayData, k: Int): ArrayData = TextKernels.minhashSlices(a, k)
  def minhashXx(a: ArrayData, k: Int): ArrayData = TextKernels.minhashXx(a, k)
  def markerCounts(t: UTF8String, ms: Array[String]): ArrayData = TextKernels.markerCounts(t, ms)
  def simhash32(t: UTF8String): UTF8String = TextKernels.simhash32(t)
}

/** Codegen-integrated expression wrapping [[TextKernels.shingles]]. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textKernels", new TextKernelsRef, classOf[TextKernelsRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.shingles($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen-integrated expression wrapping [[TextKernels.markerCounts]]:
  * array<long> of per-marker occurrence counts over padded-lowercase text.
  */
case class MarkerCounts(child: Expression, markers: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "marker_counts"

  private val markerArr = markers.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.markerCounts(input.asInstanceOf[UTF8String], markerArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textKernels", new TextKernelsRef, classOf[TextKernelsRef].getName)
    val ms = ctx.addReferenceObj("markers", markerArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.markerCounts($c, $ms);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen-integrated expression wrapping [[TextKernels.simhash32]]. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textKernels", new TextKernelsRef, classOf[TextKernelsRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.simhash32($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen-integrated expression wrapping [[TextKernels.minhashSlices]]. */
case class MinHashSlices(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes % 4 == 0, "numHashes must be a multiple of 4")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_slices"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSlices(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textKernels", new TextKernelsRef, classOf[TextKernelsRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.minhashSlices($c, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen-integrated expression wrapping [[TextKernels.minhashXx]]. */
case class MinHashXx(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_xx"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashXx(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textKernels", new TextKernelsRef, classOf[TextKernelsRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.minhashXx($c, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  /** Register SQL forms (int args must be literals). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def litInt(e: Expression): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => sys.error(s"expected integer literal, got $other")
    }
    reg.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_slices", exprs => MinHashSlices(exprs(0), litInt(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_xx", exprs => MinHashXx(exprs(0), litInt(exprs(1))), "built-in")
    def litStr(e: Expression): String = e match {
      case Literal(v: UTF8String, StringType) => v.toString
      case f if f.foldable && f.dataType == StringType =>
        f.eval().asInstanceOf[UTF8String].toString
      case other => sys.error(s"expected string literal, got $other")
    }
    reg.createOrReplaceTempFunction(
      "marker_counts",
      exprs => MarkerCounts(exprs(0), litStr(exprs(1)).split('\u0000').toSeq), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash32", exprs => SimHash32(exprs(0)), "built-in")
  }

  def wordShingles(text: Column, n: Int): Column = {
    RegisterOnce("text_exprs")(register)
    org.apache.spark.sql.functions.call_function(
      "word_shingles", text, org.apache.spark.sql.functions.lit(n))
  }

  def minhashSlices(shingles: Column, numHashes: Int): Column = {
    RegisterOnce("text_exprs")(register)
    org.apache.spark.sql.functions.call_function(
      "minhash_slices", shingles, org.apache.spark.sql.functions.lit(numHashes))
  }

  def minhashXx(shingles: Column, numHashes: Int): Column = {
    RegisterOnce("text_exprs")(register)
    org.apache.spark.sql.functions.call_function(
      "minhash_xx", shingles, org.apache.spark.sql.functions.lit(numHashes))
  }

  def simhash32(text: Column): Column = {
    RegisterOnce("text_exprs")(register)
    org.apache.spark.sql.functions.call_function("simhash32", text)
  }

  def markerCounts(text: Column, markers: Seq[String]): Column = {
    RegisterOnce("text_exprs")(register)
    org.apache.spark.sql.functions.call_function(
      "marker_counts", text, org.apache.spark.sql.functions.lit(markers.mkString("\u0000")))
  }
}
