package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Macros

/** Distributed point-in-interval (range) join.
  *
  * Spark has no native range-join operator: `p.ts BETWEEN i.start AND i.end`
  * plans as a BroadcastNestedLoopJoin (or a cartesian product when neither
  * side fits broadcast) — O(|points|·|intervals|) and single-stage, the
  * classic 100 TB scale-killer. This operator uses the standard
  * bin-expansion rewrite:
  *
  *  1. pick a bin width; each point maps to ONE bin of its timestamp;
  *  2. each interval EXPLODES into every bin it overlaps
  *     (`ceil(len/binSeconds) + 1` bins, so ≤2 when `binSeconds` ≥ the
  *     longest interval);
  *  3. equi-join on (keys…, bin) — hash-partitioned, AQE-skew-splittable
  *     like any shuffle join;
  *  4. apply the exact BETWEEN as a residual filter.
  *
  * Every qualifying pair shares the point's bin (the interval covers that
  * bin because it covers the point), and the residual filter removes the
  * same-bin non-matches, so the rewrite is exact for ANY positive
  * `binSeconds` — the knob only tunes the expansion-versus-candidates
  * trade-off: small bins inflate the interval side ×(len/binSeconds); large
  * bins admit more false candidates per bin. Set it near the p99 interval
  * length; a handful of giant outlier intervals only add rows to the
  * exploded side (they do NOT force a giant bin width).
  *
  * At cluster scale this is one shuffle of each side, the same cost shape
  * as the strict bin join (J4) plus the bounded interval fan-out — and the
  * AS-OF union+window operator remains the right tool when "latest at or
  * before" is wanted instead of full interval containment.
  */
object RangeJoin {

  /** Inner point-in-interval join: every (point, interval) pair with
    * `point.tsCol` in `[startCol, endCol]` (inclusive both ends), matched
    * within equal `keys` when given. Column names must be disjoint across
    * the two frames apart from `keys` (standard join hygiene).
    *
    * @param binSeconds bin width — any positive value is CORRECT (see
    *                   class doc); size it near the longest common
    *                   interval for the fewest exploded rows.
    */
  def pointInInterval(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binSeconds: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val p = points.withColumn("__bin",
      floor(Macros.epochSeconds(col(tsCol)) / binSeconds))
    val i = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__bin", explode(sequence(
        floor(Macros.epochSeconds(col(startCol)) / binSeconds),
        floor(Macros.epochSeconds(col(endCol)) / binSeconds))))
    p.join(i, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  /** Inner interval-overlap join: every (left, right) interval pair with
    * `[lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅` (closed intervals), matched
    * within equal `keys` when given.
    *
    * Both sides explode into their overlapped bins and equi-join on the
    * bin; a pair sharing k bins would surface k times, so instead of a
    * dedup shuffle each pair is kept only at its FIRST shared bin —
    * `max(bin(lStart), bin(rStart))`. For a truly overlapping pair that
    * bin equals `bin(max(lStart, rStart))`, which both intervals cover (it
    * is ≤ `bin(min(lEnd, rEnd))`), so it is attained exactly once; the
    * overlap predicate itself stays the exact residual filter. Cost model
    * matches [[pointInInterval]]: fan-out ∝ interval length ÷ binSeconds
    * per side, one shuffle each, no quadratic stage.
    */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binSeconds: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn("__bin", explode(sequence(
        floor(Macros.epochSeconds(col(s)) / binSeconds),
        floor(Macros.epochSeconds(col(e)) / binSeconds))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), keys :+ "__bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") === greatest(
        floor(Macros.epochSeconds(col(lStart)) / binSeconds),
        floor(Macros.epochSeconds(col(rStart)) / binSeconds)))
      .drop("__bin")
  }
}
