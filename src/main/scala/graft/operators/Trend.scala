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
