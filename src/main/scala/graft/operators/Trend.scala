package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group OLS trend: slope / intercept / R² of y over x for every
  * group in one pass — the metric-drift detector ("is each event type's
  * value trending, and how strongly?") run across thousands of slices at
  * once, where fitting per-slice models driver-side would be a collect
  * loop.
  *
  *   slope = covar_samp(x,y) / var_samp(x)
  *   intercept = ȳ − slope·x̄
  *   R² = covar_samp(x,y)² / (var_samp(x)·var_samp(y))
  *
  * Built from the q47-proven moment aggregates (Welford one-pass partials,
  * merged associatively) — one hash aggregate, map-side combined, no
  * window, no per-group iteration. R² comes from the explicit moment
  * ratio rather than `corr(x,y)²` because under ANSI mode `corr` THROWS
  * DIVIDE_BY_ZERO on a zero-variance group — the moment form lets the
  * guards return NULL for degenerate groups (single point, constant x,
  * constant y) instead of failing the whole job on one flat slice.
  *
  * Determinism: moments are DOUBLE partials (association-dependent last
  * ulps) — outputs fall under the catalog's r4 convention, exactly like
  * q47 (see that scaladoc's boundary analysis and DECIMAL escape hatch).
  */
object Trend {

  /** Per-group TWO-regressor OLS — `y ~ b0 + b1·x1 + b2·x2` solved in
    * closed form (Cramer on the 3×3 normal equations), the multivariate
    * step past [[groupTrend]]: harmonic (sin/cos) seasonality fits,
    * two-feature attribution, de-trending with a covariate — still one
    * hash aggregate per group, no iteration, no driver-side fitting.
    *
    * Exactness: x's fix-point at scale 8, y at scale 4, and ALL nine
    * moments accumulate as exact DECIMAL sums (merge-order-free); the
    * Cramer determinants and R² identity
    * (`SSE = Syy − b0·Sy − b1·Sxy1 − b2·Sxy2`) are then fixed-order
    * double expressions over those exact-integer-derived values,
    * mirrored verbatim by SQL twins. Collinear groups (det = 0) and
    * zero-variance targets return NULL coefficients instead of blowing
    * up.
    *
    * @return per group: (groupCols…, n, b0, b1, b2, r2)
    */
  def trend2(
      df: DataFrame, groupCols: Seq[String],
      x1: Column, x2: Column, y: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.types.DecimalType
    val g = groupCols.map(col)
    def fx(c: Column, s: Double) =
      floor(c.cast("double") * s + 0.5).cast("long").cast(DecimalType(19, 0))
    val base = df
      .filter(x1.isNotNull && x2.isNotNull && y.isNotNull)
      .select(g ++ Seq(fx(x1, 1e8).as("__x1"), fx(x2, 1e8).as("__x2"),
        fx(y, 1e4).as("__y")): _*)
    val m = base.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x1")).as("__s1"), sum(col("__x2")).as("__s2"),
      sum(col("__y")).as("__sy"),
      sum(col("__x1") * col("__x1")).as("__s11"),
      sum(col("__x2") * col("__x2")).as("__s22"),
      sum(col("__x1") * col("__x2")).as("__s12"),
      sum(col("__x1") * col("__y")).as("__sy1"),
      sum(col("__x2") * col("__y")).as("__sy2"),
      sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("n").cast("double")
    def d(c: String, scale: Double) = col(c).cast("double") / lit(scale)
    val (xx1, xx2, sy) = (d("__s1", 1e8), d("__s2", 1e8), d("__sy", 1e4))
    val (s11, s22, s12) = (d("__s11", 1e16), d("__s22", 1e16), d("__s12", 1e16))
    val (sy1, sy2, syy) = (d("__sy1", 1e12), d("__sy2", 1e12), d("__syy", 1e8))
    val det = nD * (s11 * s22 - s12 * s12) - xx1 * (xx1 * s22 - s12 * xx2) +
      xx2 * (xx1 * s12 - s11 * xx2)
    val det0 = sy * (s11 * s22 - s12 * s12) - xx1 * (sy1 * s22 - s12 * sy2) +
      xx2 * (sy1 * s12 - s11 * sy2)
    val det1 = nD * (sy1 * s22 - s12 * sy2) - sy * (xx1 * s22 - s12 * xx2) +
      xx2 * (xx1 * sy2 - sy1 * xx2)
    val det2 = nD * (s11 * sy2 - sy1 * s12) - xx1 * (xx1 * sy2 - sy1 * xx2) +
      sy * (xx1 * s12 - s11 * xx2)
    val (b0, b1, b2) = (det0 / det, det1 / det, det2 / det)
    val sse = syy - b0 * sy - b1 * sy1 - b2 * sy2
    val sst = syy - sy * sy / nD
    val ok = col("n") > 2 && abs(det) > 0
    m.select(g ++ Seq(col("n"),
      when(ok, b0).as("b0"), when(ok, b1).as("b1"), when(ok, b2).as("b2"),
      when(ok && sst > 0, lit(1.0) - sse / sst).as("r2")): _*)
  }

  /** One row per group: (groupCols…, n, slope, intercept, r2). `x` and
    * `y` are numeric expressions (e.g. epoch-hours and a metric). Rows
    * where either is null are excluded pairwise.
    */
  def groupTrend(
      df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val g = groupCols.map(col)
    df.filter(x.isNotNull && y.isNotNull)
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        covar_samp(x, y).as("__cxy"),
        var_samp(x).as("__vx"),
        var_samp(y).as("__vy"),
        avg(x).as("__mx"),
        avg(y).as("__my"))
      .select((g ++ Seq(
        col("n"),
        when(col("__vx") > 0, col("__cxy") / col("__vx")).as("slope"),
        when(col("__vx") > 0,
          col("__my") - (col("__cxy") / col("__vx")) * col("__mx"))
          .as("intercept"),
        when(col("__vx") > 0 && col("__vy") > 0,
          col("__cxy") * col("__cxy") / (col("__vx") * col("__vy")))
          .as("r2"))): _*)
  }
}
