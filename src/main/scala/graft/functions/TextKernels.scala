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
}

/** Serializable handle for generated code: the kernel object itself holds a
  * non-serializable ThreadLocal digest, so plans reference this stateless
  * forwarder instead (the object is class-loaded fresh on each executor).
  */
class TextKernelsRef extends Serializable {
  def shingles(t: UTF8String, n: Int): ArrayData = TextKernels.shingles(t, n)
  def minhashSlices(a: ArrayData, k: Int): ArrayData = TextKernels.minhashSlices(a, k)
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
  }

  def wordShingles(text: Column, n: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    org.apache.spark.sql.functions.call_function(
      "word_shingles", text, org.apache.spark.sql.functions.lit(n))
  }

  def minhashSlices(shingles: Column, numHashes: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    org.apache.spark.sql.functions.call_function(
      "minhash_slices", shingles, org.apache.spark.sql.functions.lit(numHashes))
  }
}
