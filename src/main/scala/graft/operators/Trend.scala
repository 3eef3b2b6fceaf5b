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

  /** Mann–Kendall trend test + Sen's slope per group over a PRE-BINNED
    * series — the nonparametric "is this metric trending, and by how much
    * per bin?" that [[groupTrend]]'s OLS answers only under linear-Gauss
    * assumptions (MK sees any monotone trend; Sen's slope is the
    * outlier-robust rate estimate). The standard environmental-monitoring
    * kit, here for metric dashboards.
    *
    * Input contract (the [[graft.operators.Eval.kendallTauB]] discipline):
    * ONE row per (group, bin) — aggregate to the grid first (daily sums,
    * [[Smooth.resampleFill]] output); the all-pairs comparison then runs
    * over the BOUNDED bin frame (≤ bins²/2 pairs), never raw rows.
    * Duplicate (group, bin) rows make the result undefined (not checked).
    *
    *   S = Σ_{i&lt;j} sign(v_j − v_i),
    *   Var S = ( n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) ) / 18,
    *   z = (S − sign(S)) / √Var S      (continuity-corrected)
    *
    * Sen's slope = the exact ×2-order-statistic MEDIAN of the pairwise
    * slopes (v_j − v_i)/(bin_j − bin_i) — each slope is one double
    * division of exact scale-4/bin longs (identical IEEE both engines),
    * the median picks computed values, never interpolates.
    *
    * Exactness: S and the tie sum accumulate in DECIMAL(38,0); z is one
    * mirrored double tail with degenerates (Var ≤ 0) decided on exact
    * integers. NULL bins/values are excluded.
    *
    * @return per group: (groupCols…, n, s, z, sen_slope) — z NULL when
    *         Var S ≤ 0; sen NULL when no pair has distinct bins
    */
  def mannKendallSen(
      df: DataFrame, groupCols: Seq[String],
      binCol: Column, valueCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val g = groupCols.map(col)
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val base = df.filter(binCol.isNotNull && valueCol.isNotNull)
      .select(g ++ Seq(binCol.cast("long").as("__b"),
        floor(valueCol.cast("double") * 10000 + 0.5).cast("long")
          .as("__v4")): _*)
    val right = base.select(
      groupCols.map(c => col(c).as(s"__r_$c")) ++
        Seq(col("__b").as("__b2"), col("__v4").as("__v42")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    val pairs = base.join(broadcast(right), cond && col("__b") < col("__b2"))
      .withColumn("__sgn",
        when(col("__v42") > col("__v4"), 1L)
          .when(col("__v42") < col("__v4"), -1L).otherwise(0L))
      .withColumn("__slope",
        (col("__v42") - col("__v4")).cast("double") / 10000.0 /
          (col("__b2") - col("__b")).cast("double"))
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__slope"))
    val wAll = Window.partitionBy(g: _*)
    val ranked = pairs
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll))
    val mLo = floor((col("__m").cast("double") + 1.0) / 2.0).cast("long")
    val mHi = floor(col("__m").cast("double") / 2.0).cast("long") + 1L
    val sen = ranked.groupBy(g: _*).agg(
      ((sum(when(col("__rn") === mLo, col("__slope")).otherwise(0.0)) +
        sum(when(col("__rn") === mHi, col("__slope")).otherwise(0.0))) / 2.0)
        .as("sen_slope"),
      sum(dec(col("__sgn"))).as("__s"))
    val ties = base.groupBy(g :+ col("__v4"): _*).agg(count(lit(1)).as("__t"))
      .groupBy(g: _*).agg(
        sum(col("__t")).as("n"),
        sum(dec(col("__t")) * (dec(col("__t")) - 1) *
          (dec(col("__t")) * 2 + 5)).as("__tsum"))
    // ties is the spine (every group with data has a row; a single-bin
    // group has NO pairs and must still surface with s = 0, z/sen NULL)
    val senR = sen.select(
      groupCols.map(c => col(c).as(s"__s_$c")) ++
        Seq(col("sen_slope"), col("__s")): _*)
    val condS = groupCols.map(c => col(c) <=> col(s"__s_$c")).reduce(_ && _)
    val joined = ties.join(senR, condS, "left")
    val varNum = dec(col("n")) * (dec(col("n")) - 1) *
      (dec(col("n")) * 2 + 5) - col("__tsum")
    val varS = varNum.cast("double") / 18.0
    val sD = coalesce(col("__s"), dec(lit(0))).cast("double")
    joined.select(g ++ Seq(col("n"),
      coalesce(col("__s"), dec(lit(0))).cast("long").as("s"),
      when(varNum > 0,
        (sD - signum(sD)) / sqrt(varS)).as("z"),
      col("sen_slope")): _*)
  }
}
