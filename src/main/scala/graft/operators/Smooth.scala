package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average over ordered series — the
  * monitoring smoother (EWMA control charts, metric dashboards, drift
  * pre-filters) as an exact, engine-identical batch operator.
  *
  * The textbook recursion `z_i = α·x_i + (1−α)·z_{i−1}` is a sequential
  * float scan — not distributable, and not reproducible across engines
  * (every term's rounding depends on chain order). This operator computes
  * the NORMALIZED FIX-POINT form instead:
  *
  *   z_i = Σ_j w_j·v4_{i−j} / Σ_j w_j,   w_j = ⌊(1−α)^j·10⁸ + 0.5⌋
  *
  * truncated EXACTLY where the scale-8 integer weight underflows to 0
  * (w_j = 0 contributes nothing, so the truncation IS the fix-point
  * representation, not an approximation knob). Both numerator and
  * denominator are exact longs on any merge tree; the self-normalization
  * makes the warm-up exact too (z_1 = x_1, early terms renormalize over
  * the weights present). For i ≫ K this equals the recursion to within
  * the 10⁻⁸ weight quantization.
  *
  * Plan: no per-group self-join and no sequential scan — each row
  * BROADCASTS into the K future positions it influences (row i → targets
  * i+j with weight w_j, a K-row broadcast cross join), then one hash
  * aggregate per (group, target) and an equi-join back to the row. ×K row
  * amplification before the combine, but the shuffle is map-side-combined
  * and K is a constant (54 at α = 0.3); everything stays linear,
  * answer-sized state, no window over raw values except the row_number
  * index (per-series sequential by nature — pre-bucket longer series,
  * the [[graft.llm.Drift.cusum]] contract).
  */
object Smooth {

  /** `w_j = ⌊(1−α)^j·10⁸ + 0.5⌋` until underflow — the single source of
    * truth interpolated into BOTH engines (the Spark frame and the SQL
    * VALUES list), so cross-engine parity never depends on `pow` ulps.
    */
  private[graft] def ewmaWeights(alpha: Double): Seq[Long] = {
    require(alpha > 0 && alpha < 1, s"alpha out of range: $alpha")
    Iterator.iterate(1.0)(_ * (1.0 - alpha))
      .map(p => math.floor(p * 1e8 + 0.5).toLong)
      .takeWhile(_ > 0).toSeq
  }

  /** SQL `VALUES` twin of [[ewmaWeights]] for cross-engine oracles:
    * `(VALUES (0, 100000000), (1, …), …)` rows `(j, wt)`.
    */
  def ewmaWeightsSql(alpha: Double): String =
    ewmaWeights(alpha).zipWithIndex
      .map { case (w, j) => s"($j, $w)" }.mkString("VALUES ", ", ", "")

  /** Per-group EWMA series at the catalog's scale-4 fix-point.
    *
    * @param orderCol ordering column; `tieCols` must make the order total
    *                 for an engine-identical index
    * @return one row per input row: (groupCols…, idx, <orderCol out>,
    *         v4, ewma) — `v4` the scale-4 long of the input, `ewma` the
    *         smoothed value in original units (one double division)
    */
  def ewma(
      df: DataFrame, groupCols: Seq[String], orderCol: Column,
      orderOut: String, valueCol: Column, tieCols: Seq[String],
      alpha: Double = 0.3): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val g = groupCols.map(col)
    val ord = col("__o").asc +: tieCols.map(c => col(c).asc)
    val wIdx = Window.partitionBy(g: _*).orderBy(ord: _*)
    val base = df.filter(valueCol.isNotNull)
      .select(g ++ Seq(orderCol.as("__o"),
        floor(valueCol.cast("double") * 10000 + 0.5).cast("long")
          .as("v4")) ++ tieCols.map(col): _*)
      .withColumn("idx", row_number().over(wIdx).cast("long"))
      .drop(tieCols: _*)
    val wts = broadcast(ewmaWeights(alpha).zipWithIndex
      .map { case (w, j) => (j.toLong, w) }.toDF("__j", "__wt"))
    val contrib = base.crossJoin(wts)
      .groupBy(g :+ (col("idx") + col("__j")).as("__tgt"): _*)
      .agg(sum(col("__wt") * col("v4")).as("__num"),
        sum(col("__wt")).as("__den"))
    val cond = groupCols.map(c => col(c) <=> col(s"__a_$c")).reduce(_ && _) &&
      col("idx") === col("__tgt")
    base.join(
        contrib.select(groupCols.map(c => col(c).as(s"__a_$c")) ++
          Seq(col("__tgt"), col("__num"), col("__den")): _*),
        cond)
      .select(g ++ Seq(col("idx"), col("__o").as(orderOut), col("v4"),
        (col("__num").cast("double") / col("__den").cast("double") / 10000.0)
          .as("ewma")): _*)
  }
}
