package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Equi-DEPTH histograms: per group, split the value distribution into `k`
  * buckets of (near-)equal ROW COUNT and report each bucket's boundaries —
  * the quantile-style histogram that stays informative on skewed
  * distributions where equi-width bars (the C2–C4 bin macros, q11) collapse
  * into one giant bucket. This is also exactly the optimizer-statistics
  * histogram shape (equi-height) that engines keep per column.
  *
  * Bucketing is SQL-standard `ntile(k)`: bucket sizes differ by at most
  * one row, identical in any engine. The ordering appends a unique
  * tie-break column, so ties at bucket boundaries are split
  * deterministically and the histogram is bit-identical cross-engine.
  *
  * Plan shape (scale story): one window (partitioned BY GROUP — never a
  * global single-partition window; groups parallelize across executors)
  * + one (group, bucket) hash aggregate. For a group too large for one
  * task's sort, the documented alternative is bucketing by pre-computed
  * percentile fences ([[Quantiles]]) — same output, two aggregates, no
  * window; ntile is preferred here because it is exact, single-pass, and
  * the group cardinality of real profiling runs (per-category, per-slice)
  * keeps partitions bounded.
  */
object Histogram {

  /** One row per (group, bucket): (groupCols…, bucket ∈ [1, k], n,
    * lo, hi) — lo/hi the bucket's min/max value. `tieBreak` must be
    * unique per row (it fixes boundary ties deterministically).
    */
  def equiDepth(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int,
      tieBreak: Column): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol), tieBreak)
    df.filter(col(valueCol).isNotNull)
      .withColumn("bucket", ntile(k).over(w))
      .groupBy((g :+ col("bucket")): _*)
      .agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }
}
