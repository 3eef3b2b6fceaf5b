package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled Jaro-Winkler kernel for the record-linkage verify leg.
  *
  * Spark ships `levenshtein` but no Jaro-Winkler, the de-facto standard
  * scorer for short-string linkage (names, titles, identifiers) — JW
  * weights agreement at the string HEAD, where human-entered variants
  * agree, and is length-normalized to [0,1] so one threshold works across
  * fields. The kernel is the classic two-pass algorithm: a windowed
  * greedy match pass (window = max(|a|,|b|)/2 − 1), a transposition count
  * over the matched subsequences, then the Winkler prefix boost
  * (min 4-unit common prefix, scale 0.1) applied only when jaro > 0.7.
  *
  * Cross-engine parity is exact, not approximate: the comparison unit is
  * the UTF-8 BYTE and the arithmetic order is
  * `(m/|a| + m/|b| + (m−t)/m) / 3` then `j + p·0.1·(1−j)` — both choices
  * verified bit-identical to DuckDB's `jaro_winkler_similarity` over 20k
  * adversarial random pairs (small alphabet, lengths 0–12, boost-
  * threshold and empty/equal edges included). Empty strings score 0 (the
  * DuckDB convention, even for empty-vs-empty); equal strings score 1.
  * Byte basis means multi-byte code points compare per byte — identical
  * on both engines, documented here because it differs from the code-
  * point basis the q-gram kernels use.
  */
object JaroKernels {

  /** Jaro similarity on UTF-8 bytes; 0.0 when either side is empty. */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes
    val y = b.getBytes
    val l1 = x.length
    val l2 = y.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (a.equals(b)) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && x(i) == y(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  /** Winkler boost: prefix (≤4 bytes) · 0.1 · (1 − jaro), only above 0.7. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val x = a.getBytes
    val y = b.getBytes
    val cap = math.min(4, math.min(x.length, y.length))
    var p = 0
    while (p < cap && x(p) == y(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }
}

/** Native Catalyst expression wrapping [[JaroKernels.jaroWinkler]] — runs
  * inside whole-stage codegen as a static call, so a blocked candidate
  * join scores pairs without leaving the generated loop (preference-order
  * tier (b): a scalar the built-in function set can't express).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Register as a SQL-callable function (`SELECT jaro_winkler(a, b)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinklerSim(exprs(0), exprs(1)), "built-in")

  /** Column-API form. */
  def jaroWinkler(a: Column, b: Column): Column = {
    RegisterOnce("jaro_winkler")(register)
    org.apache.spark.sql.functions.call_function("jaro_winkler", a, b)
  }
}
