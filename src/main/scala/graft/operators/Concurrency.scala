package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Peak interval concurrency — the sweep-line "how many are open at
  * once?" statistic (max concurrent sessions, in-flight shipments, open
  * incidents): each interval emits +1 at start and −1 at end, a running
  * sum over the time-ordered event stream is the live count, and its
  * maximum is the peak.
  *
  * Semantics: intervals are HALF-OPEN [start, end) — an interval ending
  * exactly when another starts does not overlap it, enforced by sorting
  * the −1 event before the +1 at equal timestamps (`ORDER BY t, delta`).
  * Degenerate intervals (end ≤ start) are excluded.
  *
  * Determinism with ties: within a block of identical (t, delta) events
  * the running sum's intermediate values form the same multiset under
  * any order (+1 block peaks at its last row, −1 block at its first), so
  * `peak` and the earliest time reaching it are engine- and
  * order-independent — pure integer arithmetic throughout.
  *
  * Scale: the running sum is one per-group ordered window over 2·n
  * events — per-group sequential by nature (a global count admits no
  * partial order); shard by a coarser group or time-bucket the sweep for
  * extreme groups, the [[graft.llm.Drift.cusum]] contract. Peak
  * extraction is an answer-sized aggregate + broadcast join back.
  *
  * @return per group: (groupCols…, n_intervals, peak, peak_at) —
  *         peak_at the earliest event time at which the live count
  *         first reaches the peak
  */
object Concurrency {

  def maxConcurrent(
      df: DataFrame, groupCols: Seq[String],
      startCol: Column, endCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val g = groupCols.map(col)
    val iv = df
      .filter(startCol.isNotNull && endCol.isNotNull && endCol > startCol)
      .select(g ++ Seq(startCol.cast("long").as("__s"),
        endCol.cast("long").as("__e")): _*)
    val ev = iv.select(g ++ Seq(col("__s").as("__t"), lit(1L).as("__d")): _*)
      .unionAll(iv.select(g ++ Seq(col("__e").as("__t"),
        lit(-1L).as("__d")): _*))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__t").asc, col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = ev.withColumn("__cum", sum(col("__d")).over(wCum))
    val peaks = c.groupBy(g: _*).agg(max(col("__cum")).as("peak"))
    val cond = groupCols.map(x => col(x) <=> col(s"__p_$x")).reduce(_ && _)
    val peakAt = c
      .join(broadcast(peaks.select(groupCols.map(x => col(x).as(s"__p_$x")) :+
        col("peak"): _*)), cond && col("__cum") === col("peak"))
      .groupBy(g: _*)
      .agg(max(col("peak")).as("peak"), min(col("__t")).as("peak_at"))
    val n = iv.groupBy(g: _*).agg(count(lit(1)).as("n_intervals"))
    val jc = groupCols.map(x => col(x) <=> col(s"__n_$x")).reduce(_ && _)
    n.join(broadcast(peakAt.select(groupCols.map(x => col(x).as(s"__n_$x")) ++
        Seq(col("peak"), col("peak_at")): _*)), jc)
      .select(g ++ Seq(col("n_intervals"), col("peak"), col("peak_at")): _*)
  }
}
