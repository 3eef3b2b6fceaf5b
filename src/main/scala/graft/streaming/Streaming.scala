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
    bandKeyRows(docs, idCol, textCol, cfg)
      .groupByKey { case (_, band, key) => (band, key) }
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

  /** TTL-bounded variant of [[nearDupCandidates]]: each band key's keeper
    * expires after `ttl` of processing-time INACTIVITY (the horizon slides on
    * every arrival that touches the key), after which the next arrival
    * re-claims the key as a fresh keeper. This bounds state to the keys seen
    * within one dedup horizon — the shape production continuous dedup needs,
    * trading global uniqueness for bounded memory: a duplicate arriving more
    * than `ttl` after its keeper's last sighting is admitted as new.
    *
    * Timeouts fire at micro-batch boundaries (Structured Streaming checks
    * expired state when a batch runs), so eviction latency is `ttl` plus the
    * gap to the next triggered batch. Batch-DataFrame execution ignores
    * processing-time timeouts (single invocation per group), where this
    * degenerates to [[nearDupCandidates]] exactly.
    */
  def nearDupCandidatesTtl(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ttl: String = "24 hours",
      cfg: graft.llm.MinHashLsh.Config = graft.llm.MinHashLsh.Config()): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    bandKeyRows(docs, idCol, textCol, cfg)
      .groupByKey { case (_, band, key) => (band, key) }
      .flatMapGroupsWithState[Long, (Long, Int, Long)](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (bandKey: (Int, String), rows: Iterator[(Long, Int, String)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // horizon passed with no arrivals on this band key: forget the
            // keeper so the key can be re-claimed
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_._1).toSeq.distinct.sorted
            val keeper = state.getOption.getOrElse(ids.min)
            state.update(keeper)
            state.setTimeoutDuration(ttl)
            ids.filterNot(_ == keeper).map(id => (id, bandKey._1, keeper)).iterator
          }
      }
      .toDF("dup_id", "band", "kept_id")
  }

  /** Shared LSH front half of the streaming near-dup filters: per-document
    * band keys as a typed Dataset, ready for `groupByKey((band, key))`.
    */
  private def bandKeyRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: graft.llm.MinHashLsh.Config) = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.llm.MinHashLsh
      .bandKeys(graft.llm.MinHashLsh.signatures(docs, idCol, textCol, cfg), cfg)
      .select(col("id").cast("long"), col("band").cast("int"),
        col("band_key").cast("string"))
      .as[(Long, Int, String)]
  }

  /** Streaming SCD2 (the continuous form of `operators/Scd.scd2` / q100):
    * per-key attribute change tracking that emits each validity interval
    * AS IT CLOSES — `(key, version, attr, valid_from_us, valid_to_us)`.
    * The OPEN (is_current) run lives in per-key state, not the output:
    * append-mode streams cannot retract, so the row for "what is true
    * NOW" belongs to a snapshot/batch read while this emits the immutable
    * closed history (the CDC convention). Exact batch law, tested in
    * StreamingSpec: on a batch DataFrame this equals
    * `Scd.scd2(...).filter(valid_to IS NOT NULL)` row for row.
    *
    * State per key = (current attr, version, valid_from, last ts) — O(1)
    * regardless of history length, the `mapGroupsWithState` analog of the
    * batch operator's one-window-frame-in-flight envelope. Ordering
    * contract: rows are sorted by `tsCol` within each invocation
    * (micro-batch); an arrival OLDER than the key's last applied ts is
    * DROPPED (the watermark discipline — feed monotone-enough sources or
    * widen the trigger); per-key ts must be unique for deterministic runs
    * (same contract the batch form covers with `tieCols`).
    */
  def scd2Closed(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol).cast("timestamp")).as("ts"),
        col(attrCol).cast("string").as("a"))
      .as[(Long, Long, Option[String])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[
          (Option[String], Int, Long, Long),
          (Long, Int, Option[String], Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Option[String])],
            state: GroupState[(Option[String], Int, Long, Long)]) =>
          var (cur, ver, from, last) =
            state.getOption.getOrElse((Option.empty[String], 0, 0L, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Int, Option[String], Long, Long)]
          rows.toSeq.sortBy(_._2).foreach { case (_, ts, attr) =>
            if (ver != 0 && ts < last) {
              // late arrival behind the applied frontier: dropped (see doc)
            } else if (ver == 0) {
              cur = attr; ver = 1; from = ts; last = ts
            } else if (attr == cur) { // Option equality = null-safe <=>
              last = ts
            } else {
              out += ((key, ver, cur, from, ts))
              cur = attr; ver += 1; from = ts; last = ts
            }
          }
          state.update((cur, ver, from, last))
          out.iterator
      }
      .toDF(keyCol, "version", attrCol, "valid_from_us", "valid_to_us")
  }

  /** Streaming row-level sessionization (the continuous form of
    * `operators/Sessionize` / q121): per-entity gap-and-island session
    * tracking that emits each session AS IT CLOSES —
    * `(entity, session_idx, n_events, start_us, end_us)`. The OPEN
    * session lives in per-key state (append streams cannot retract), so
    * "the session in progress" belongs to a snapshot read while this
    * emits the immutable closed history — the same split as
    * [[scd2Closed]].
    *
    * Boundary matches the batch operator (and `session_window`, law-
    * tested there): an event EXACTLY `gapUs` after the last one
    * CONTINUES the session; strictly greater closes it. State per key =
    * (session_idx, n_events, start, last) — O(1) regardless of session
    * length. Arrivals behind the applied per-key frontier are dropped
    * (the [[scd2Closed]] watermark discipline).
    *
    * Exact batch law (StreamingSpec): on a batch frame this equals
    * `Sessionize.sessionSummary(...)` minus each entity's LAST
    * (still-open) session, row for row.
    */
  def sessionizeClosed(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      gapUs: Long): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    // State is keyed on the entity's NATIVE type (the batch Sessionize
    // convention): a blanket cast-to-long would, under non-ANSI
    // semantics, turn string ids into NULL and silently collapse every
    // entity into one state group. Integral keys run long-keyed (output
    // cast back to the input dtype); string keys run string-keyed; other
    // key types are a loud contract error.
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, StringType}
    val dt = events.schema(entityCol).dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        sessionLoop[Long](
          events.select(col(entityCol).cast("long").as("k"),
            unix_micros(col(tsCol).cast("timestamp")).as("ts"))
            .as[(Long, Long)],
          gapUs)
          .toDF(entityCol, "session_idx", "n_events", "start_us", "end_us")
          .withColumn(entityCol, col(entityCol).cast(dt))
      case StringType =>
        sessionLoop[String](
          events.select(col(entityCol).cast("string").as("k"),
            unix_micros(col(tsCol).cast("timestamp")).as("ts"))
            .as[(String, Long)],
          gapUs)
          .toDF(entityCol, "session_idx", "n_events", "start_us", "end_us")
      case other => throw new IllegalArgumentException(
        s"sessionizeClosed: entity column '$entityCol' has unsupported key " +
          s"type ${other.simpleString}; use an integral or string entity id")
    }
  }

  /** The per-entity gap-and-island loop behind [[sessionizeClosed]],
    * generic in the state-key type (long and string instantiations).
    */
  private def sessionLoop[K](
      ds: org.apache.spark.sql.Dataset[(K, Long)], gapUs: Long)(
      implicit ke: org.apache.spark.sql.Encoder[K],
      se: org.apache.spark.sql.Encoder[(Long, Long, Long, Long)],
      oe: org.apache.spark.sql.Encoder[(K, Long, Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(K, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[
          (Long, Long, Long, Long),
          (K, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long)],
            state: GroupState[(Long, Long, Long, Long)]) =>
          var (idx, n, start, last) =
            state.getOption.getOrElse((0L, 0L, 0L, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(K, Long, Long, Long, Long)]
          rows.toSeq.sortBy(_._2).foreach { case (_, ts) =>
            if (idx != 0 && ts < last) {
              // late arrival behind the applied frontier: dropped (see doc)
            } else if (idx == 0) {
              idx = 1; n = 1; start = ts; last = ts
            } else if (ts - last > gapUs) {
              out += ((key, idx, n, start, last))
              idx += 1; n = 1; start = ts; last = ts
            } else {
              n += 1; last = ts
            }
          }
          state.update((idx, n, start, last))
          out.iterator
      }
  }

  /** Streaming one-sided CUSUM monitor — the continuous form of
    * [[graft.llm.Drift.cusumAlarms]] (Page's sequential decision rule,
    * run per entity as events arrive): emits ONE alarm row per
    * (entity, direction) the FIRST time g⁺/g⁻ crosses the threshold.
    *
    * State per key is O(1) — (row count, both drift prefix sums, both
    * running minima, fired flags, frontier) — which is exactly why the
    * batch operator pins NO-RESTART semantics: the running-minimum
    * identity `g = S − min(0, min S)` folds arrivals incrementally, and
    * on a batch frame this equals `Drift.cusumAlarms` row for row (the
    * StreamingSpec law). All arithmetic is the same scale-4 exact-long
    * fixed point — no float ever enters state. Arrivals behind the
    * applied per-key frontier are dropped (the [[scd2Closed]]
    * discipline); order ties within a micro-batch break by arrival —
    * give events distinct timestamps per entity (the batch operator's
    * tie-column contract) for engine-exact parity.
    */
  def cusumMonitor(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String,
      refMean: Double, slack: Double, threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    require(slack >= 0, "slack must be >= 0")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, StringType}
    val mu4 = math.floor(refMean * 10000 + 0.5).toLong
    val k4 = math.floor(slack * 10000 + 0.5).toLong
    val h4 = math.floor(threshold * 10000 + 0.5).toLong
    def prepared(keyCast: String) = events
      .filter(col(valueCol).isNotNull)
      .select(col(entityCol).cast(keyCast).as("k"),
        unix_micros(col(tsCol).cast("timestamp")).as("ts"),
        floor(col(valueCol).cast("double") * 10000 + 0.5).cast("long").as("v4"))
    val dt = events.schema(entityCol).dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        cusumLoop[Long](prepared("long").as[(Long, Long, Long)], mu4, k4, h4)
          .toDF(entityCol, "direction", "alarm_idx", "alarm_us", "stat4")
          .withColumn(entityCol, col(entityCol).cast(dt))
      case StringType =>
        cusumLoop[String](prepared("string").as[(String, Long, Long)], mu4, k4, h4)
          .toDF(entityCol, "direction", "alarm_idx", "alarm_us", "stat4")
      case other => throw new IllegalArgumentException(
        s"cusumMonitor: entity column '$entityCol' has unsupported key " +
          s"type ${other.simpleString}; use an integral or string entity id")
    }
  }

  private def cusumLoop[K](
      ds: org.apache.spark.sql.Dataset[(K, Long, Long)],
      mu4: Long, k4: Long, h4: Long)(
      implicit ke: org.apache.spark.sql.Encoder[K],
      se: org.apache.spark.sql.Encoder[(Long, Long, Long, Long, Long, Long, Long)],
      oe: org.apache.spark.sql.Encoder[(K, String, Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(K, String, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[
          (Long, Long, Long, Long, Long, Long, Long),
          (K, String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long, Long)],
            state: GroupState[(Long, Long, Long, Long, Long, Long, Long)]) =>
          var (i, su, minSu, sd, minSd, fired, frontier) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, 0L, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(K, String, Long, Long, Long)]
          rows.toSeq.sortBy(_._2).foreach { case (_, ts, v4) =>
            if (i != 0 && ts < frontier) {
              // late arrival behind the applied frontier: dropped (see doc)
            } else {
              i += 1; frontier = ts
              su += v4 - mu4 - k4
              sd += mu4 - v4 - k4
              if (su < minSu) minSu = su
              if (sd < minSd) minSd = sd
              val gu = su - math.min(0L, minSu)
              val gd = sd - math.min(0L, minSd)
              if ((fired & 1L) == 0L && gu >= h4) {
                fired |= 1L; out += ((key, "up", i, ts, gu))
              }
              if ((fired & 2L) == 0L && gd >= h4) {
                fired |= 2L; out += ((key, "down", i, ts, gd))
              }
            }
          }
          state.update((i, su, minSu, sd, minSd, fired, frontier))
          out.iterator
      }
  }

  /** Streaming EWMA monitor — the O(K)-state twin of
    * [[graft.operators.Smooth.ewma]]: per entity, a ring of the last K
    * scale-4 values (K = the weight-underflow tap count, 54 at α = 0.3)
    * reproduces EXACTLY the batch operator's normalized fix-point
    * smoother — same integer weights, same long num/den, same final
    * double expression — so batch ≡ stream is a law, not an
    * approximation. Late rows behind the applied frontier are dropped
    * (the [[cusumMonitor]] contract); the law's tie contract is unique
    * per-entity timestamps.
    *
    * @return frame (entityCol, idx, ts_us, ewma) — one row per applied
    *         event, `ewma` in original units
    */
  def ewmaMonitor(
      events: DataFrame, entityCol: String, tsCol: String, valueCol: String,
      alpha: Double = 0.3): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, StringType}
    val wts = graft.operators.Smooth.ewmaWeights(alpha)
    def prepared(keyCast: String) = events
      .filter(col(valueCol).isNotNull)
      .select(col(entityCol).cast(keyCast).as("k"),
        unix_micros(col(tsCol).cast("timestamp")).as("ts"),
        floor(col(valueCol).cast("double") * 10000 + 0.5).cast("long").as("v4"))
    // the batch operator's exact final expression, replicated post-loop
    def finish(df: DataFrame): DataFrame = df
      .withColumn("ewma",
        col("__num").cast("double") / col("__den").cast("double") / 10000.0)
      .drop("__num", "__den")
    val dt = events.schema(entityCol).dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        finish(ewmaLoop[Long](prepared("long").as[(Long, Long, Long)], wts)
          .toDF(entityCol, "idx", "ts_us", "__num", "__den"))
          .withColumn(entityCol, col(entityCol).cast(dt))
      case StringType =>
        finish(ewmaLoop[String](prepared("string").as[(String, Long, Long)], wts)
          .toDF(entityCol, "idx", "ts_us", "__num", "__den"))
      case other => throw new IllegalArgumentException(
        s"ewmaMonitor: entity column '$entityCol' has unsupported key " +
          s"type ${other.simpleString}; use an integral or string entity id")
    }
  }

  private def ewmaLoop[K](
      ds: org.apache.spark.sql.Dataset[(K, Long, Long)], wts: Seq[Long])(
      implicit ke: org.apache.spark.sql.Encoder[K],
      se: org.apache.spark.sql.Encoder[(Long, Long, Seq[Long])],
      oe: org.apache.spark.sql.Encoder[(K, Long, Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(K, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val k = wts.length
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Seq[Long]), (K, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long, Long)],
            state: GroupState[(Long, Long, Seq[Long])]) =>
          var (i, frontier, recent) =
            state.getOption.getOrElse((0L, Long.MinValue, Seq.empty[Long]))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(K, Long, Long, Long, Long)]
          rows.toSeq.sortBy(_._2).foreach { case (_, ts, v4) =>
            if (i != 0 && ts < frontier) {
              // late arrival behind the applied frontier: dropped
            } else {
              i += 1; frontier = ts
              recent = (v4 +: recent).take(k) // newest-first ring
              var num = 0L; var den = 0L; var j = 0
              while (j < recent.length) {
                num += wts(j) * recent(j); den += wts(j); j += 1
              }
              out += ((key, i, ts, num, den))
            }
          }
          state.update((i, frontier, recent))
          out.iterator
      }
  }

  /** Windowed PSI drift monitor — the deployable form of
    * [[graft.llm.Drift.psiAgainstBaseline]]: static [mn, mx) bins and a
    * frozen baseline turn PSI into ONE watermarked tumbling-window
    * aggregate (bins conditional counts per window — bounded state), so
    * current traffic is graded per window with no second pass. Reuses
    * the batch operator's exact Column expressions (bin clamp,
    * conditional counts, scale-8 term sum), making batch ≡ stream a
    * law, not a property.
    *
    * @return frame (window_start, window_end, n, psi8, psi) — in a
    *         stream, rows emit when the watermark closes each window
    */
  def psiMonitor(
      events: DataFrame, tsCol: String, valueCol: String,
      mn: Double, mx: Double, bins: Int, baseline: Seq[Double],
      windowDur: String, watermark: String = "0 seconds"): DataFrame = {
    import graft.llm.Drift
    val aggs = Drift.baselineAggs(bins)
    events.filter(col(valueCol).isNotNull)
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermark)
      .select(window(col("__ts"), windowDur).as("__w"),
        Drift.binClamped(col(valueCol), mn, mx, bins).as("__bin"))
      .groupBy(col("__w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(Seq(col("__w.start").as("window_start"),
        col("__w.end").as("window_end")) ++
        Drift.baselinePsiCols(bins, baseline): _*)
  }

  /** Live concurrency monitor — the O(1)-state streaming twin of
    * [[graft.operators.Concurrency.maxConcurrent]]: consume the ±1
    * open/close event stream per group, keep (live, peak, frontier), and
    * EMIT a row each time the live count reaches a new record high — the
    * capacity-alarm form of the batch sweep ("we just hit N concurrent
    * sessions"). On tie-free ordered input the last emitted peak equals
    * the batch operator's peak and first-reach time exactly (law-tested);
    * late events behind the applied frontier are dropped (the
    * [[cusumMonitor]] contract — a sweep cannot be retroactively
    * corrected in O(1) state).
    *
    * @param deltaCol +1 (open) / −1 (close) integer column
    * @return frame (entityCol, t_us, peak) — one row per record high
    */
  def concurrencyMonitor(
      events: DataFrame, entityCol: String, tsCol: String,
      deltaCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, StringType}
    def prepared(keyCast: String) = events
      .filter(col(deltaCol).isNotNull)
      .select(col(entityCol).cast(keyCast).as("k"),
        unix_micros(col(tsCol).cast("timestamp")).as("ts"),
        col(deltaCol).cast("long").as("d"))
    val dt = events.schema(entityCol).dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        concurrencyLoop[Long](prepared("long").as[(Long, Long, Long)])
          .toDF(entityCol, "t_us", "peak")
          .withColumn(entityCol, col(entityCol).cast(dt))
      case StringType =>
        concurrencyLoop[String](prepared("string").as[(String, Long, Long)])
          .toDF(entityCol, "t_us", "peak")
      case other => throw new IllegalArgumentException(
        s"concurrencyMonitor: entity column '$entityCol' has unsupported " +
          s"key type ${other.simpleString}; use an integral or string id")
    }
  }

  private def concurrencyLoop[K](
      ds: org.apache.spark.sql.Dataset[(K, Long, Long)])(
      implicit ke: org.apache.spark.sql.Encoder[K],
      se: org.apache.spark.sql.Encoder[(Long, Long, Long)],
      oe: org.apache.spark.sql.Encoder[(K, Long, Long)])
      : org.apache.spark.sql.Dataset[(K, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (K, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long, Long)],
            state: GroupState[(Long, Long, Long)]) =>
          var (live, peak, frontier) =
            state.getOption.getOrElse((0L, 0L, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[(K, Long, Long)]
          // closes before opens at equal timestamps: half-open intervals
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, d) =>
            if (frontier != Long.MinValue && ts < frontier) {
              // late arrival behind the applied frontier: dropped
            } else {
              frontier = ts
              live += d
              if (live > peak) { peak = live; out += ((key, ts, peak)) }
            }
          }
          state.update((live, peak, frontier))
          out.iterator
      }
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
