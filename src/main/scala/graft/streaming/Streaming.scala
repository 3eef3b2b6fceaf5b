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

  /** Streaming MinHash-LSH near-duplicate filter: each arriving document
    * whose LSH band key was already claimed by an earlier document is
    * emitted as a duplicate CANDIDATE `(dup_id, band, kept_id)` — the
    * streaming form of `MinHashLsh.candidatePairs`, with the keeper decided
    * by arrival order (first-seen wins) instead of lowest id. A document
    * colliding in k bands yields k rows; callers aggregate
    * (`groupBy(dup_id, kept_id).count()`) and Jaccard-verify candidates
    * exactly as in the batch pipeline.
    *
    * State = one keeper id per observed band key, held in
    * `flatMapGroupsWithState` — the state IS the corpus's LSH index, which
    * is inherent to global dedup (a TTL/timeout variant would bound it to a
    * dedup horizon). On a batch DataFrame the same transform runs with
    * per-group single-call state, where first-seen degenerates to min-id —
    * the batch convention — so batch and stream agree whenever arrival
    * order is id order (tested both ways in StreamingSpec).
    */
  def nearDupCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: graft.llm.MinHashLsh.Config = graft.llm.MinHashLsh.Config()): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val bk = graft.llm.MinHashLsh
      .bandKeys(graft.llm.MinHashLsh.signatures(docs, idCol, textCol, cfg), cfg)
      .select(col("id").cast("long"), col("band").cast("int"),
        col("band_key").cast("string"))
      .as[(Long, Int, String)]
    bk.groupByKey { case (_, band, key) => (band, key) }
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bandKey: (Int, String), rows: Iterator[(Long, Int, String)],
            state: GroupState[Long]) =>
          // sorted for determinism when several ids share one micro-batch
          val ids = rows.map(_._1).toSeq.distinct.sorted
          val keeper = state.getOption.getOrElse(ids.min)
          state.update(keeper)
          ids.filterNot(_ == keeper).map(id => (id, bandKey._1, keeper)).iterator
      }
      .toDF("dup_id", "band", "kept_id")
  }

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
