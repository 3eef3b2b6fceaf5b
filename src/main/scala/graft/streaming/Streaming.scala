package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming flavor of the engine's incremental semantics.
  *
  * The reference is incremental *batch* (idempotent upserts, SURVEY §2.10) —
  * streaming is not required for parity — but the two core shapes map 1:1
  * onto Structured Streaming and are provided for pipelines that want
  * continuous ingest:
  *
  *  - the 10-minute bin aggregation (C6+A4) ≡ a tumbling event-time window
  *    with a watermark;
  *  - the business-key dedupe (W3) ≡ `dropDuplicates` within the watermark
  *    (state truncated automatically — bounded memory at any scale).
  *
  * Both transforms work unchanged on batch DataFrames (Spark's unified
  * semantics), which is how the tests drive them deterministically.
  */
object Streaming {

  /** Tumbling 10-minute bin aggregation with event-time watermark. */
  def binAgg(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), "10 minutes").as("win") +: keyCols.map(col)): _*)
      .agg(
        count(lit(1)).as("n"),
        avg(col(valueCol)).as("avg_value"),
        sum(col(valueCol)).as("sum_value"))
      .select((col("win.start").as("bin_start") +: keyCols.map(col) :+
        col("n") :+ col("avg_value") :+ col("sum_value")): _*)

  /** Streaming dedupe on a business key within the watermark horizon. */
  def dedupe(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Gap-based session aggregation (the streaming form of q45): sessions
    * close after `gap` idle time; watermark bounds session state. Same
    * `session_window` call as the batch catalog query — unified semantics.
    */
  def sessionAgg(
      events: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap).as("session") +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select((col("session.start").as("session_start") +:
        col("session.end").as("session_end") +:
        keyCols.map(col) :+ col("n") :+ col("sum_value")): _*)
}
