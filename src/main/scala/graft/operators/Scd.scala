package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: compress a keyed
  * event/snapshot stream into validity-interval rows — one row per
  * (key, attribute-run), carrying `valid_from`/`valid_to`/`version`/
  * `is_current`. The lakehouse "dimension history" op the reference's
  * month-wise upserts (S10/S11, `operators/Merge`) stop short of: Merge
  * answers "what is the latest row", SCD2 answers "what was true WHEN".
  *
  * Change detection is null-safe (`<=>`): a NULL attribute value is a
  * legitimate tracked state, opening and closing intervals like any other
  * value; consecutive NULLs compress into one run.
  *
  * Scale shape: one shuffle on the dimension key, then two window passes
  * over the SAME partitioning (lag to find run starts, lead on the
  * filtered run-start frame to close intervals) — the filter between them
  * preserves distribution and ordering, so Catalyst plans a single
  * Exchange and reuses its Sort (plan-pinned in OperatorsSpec). Per-key
  * state is one row in flight per window frame — no driver state, no
  * multi-pass joins; skewed keys are bounded by per-key history length,
  * the same envelope as any per-key window (q07/q10).
  *
  * Determinism: `(orderCol, tieCols…)` must be a per-key total order —
  * the same contract as priority dedupe (`Dedupe.topOnePerKey`); given
  * that, output is bit-identical on any partitioning. Timestamps are
  * returned as-is; callers project to epoch_us at the edge (catalog
  * convention).
  */
object Scd {

  /** Build the SCD2 history of `attrCol` per `keyCols`.
    *
    * @param orderCol the event-time column (becomes `valid_from`)
    * @param tieCols  extra columns making the per-key order total
    * @return key cols + `version` (1-based per key), `attrCol`,
    *         `valid_from`, `valid_to` (NULL = open), `is_current`
    */
  def scd2(
      df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCols: Seq[String], attrCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val keys = keyCols.map(col)
    val order = (orderCol +: tieCols).map(col)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val runStarts = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      // null-safe: a run starts where the attribute IS DISTINCT FROM the
      // previous row's (first row: lag is NULL and we can't distinguish a
      // NULL attr — use a presence flag instead of a sentinel value)
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col(attrCol) <=> col("__prev")))
    runStarts
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys :+ col("version") :+ col(attrCol) :+ col("valid_from")
        :+ col("valid_to") :+ col("is_current")): _*)
  }
}
