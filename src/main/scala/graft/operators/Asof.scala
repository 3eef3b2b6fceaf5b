package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key, optionally bounded by a
  * staleness tolerance (reference J5, `src/10_build_features.py:168-178` +
  * staleness post-filter `10:254-259`).
  *
  * Spark has no built-in AS-OF join. The naive theta-join
  * (`l.join(r, r.ts <= l.ts)`) is a per-key cartesian product — quadratic,
  * dead at scale. This implementation uses the *union + ordered window*
  * technique instead: tag both sides, union, and run
  * `last(value, ignoreNulls).over(partitionBy(key).orderBy(ts, side).rowsBetween(-inf, 0))`.
  * Cost = one hash shuffle + one sort over (|L|+|R|) rows — the same
  * complexity class as a sort-merge join, linear in data size, fully
  * parallel per key. This is the plan a native engine's ASOF operator
  * produces, expressed with built-in operators so Catalyst/AQE still apply.
  */
object Asof {

  /** @param left        left (probe) side; all its columns are preserved
    * @param right       right (reference) side
    * @param keys        equi-join key column names (present on both sides)
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param payloadCols right columns to carry (renamed as given)
    * @param toleranceSec if set, matches older than this many seconds are
    *                     nulled out (reference staleness rule F6)
    * @param rightTieBreak column ordering right rows that share a timestamp;
    *                      the *last* under this ordering wins (deterministic)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Map[String, String],
      toleranceSec: Option[Long] = None,
      rightTieBreak: Option[String] = None): DataFrame = {

    val payload = struct(
      (col(rightTime).as("__asof_ts") +:
        payloadCols.toSeq.sortBy(_._1).map { case (from, to) => col(from).as(to) }): _*)

    val tieBreak = rightTieBreak.map(col).getOrElse(lit(0L))
    val rightU = right
      .select((keys.map(col) :+ col(rightTime).as("__ts") :+ payload.as("__rv") :+ tieBreak.as("__tb")): _*)
      .withColumn("__side", lit(0))

    val leftU = left
      .withColumn("__ts", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(rightU.schema("__tb").dataType))

    val unioned = leftU.unionByName(rightU, allowMissingColumns = true)

    // Right rows sort before left rows at equal ts (side 0 < 1) so a right
    // row at exactly leftTime matches (<= semantics). Among right ties the
    // last under __tb wins via last(ignoreNulls).
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val fresh = toleranceSec match {
      case Some(tol) =>
        when(
          col("__m").isNotNull &&
            (col("__ts").cast("long") - col("__m.__asof_ts").cast("long")) <= tol,
          col("__m"))
      case None => col("__m")
    }

    val withPayload = payloadCols.toSeq.sortBy(_._1).foldLeft(
      matched.withColumn("__f", fresh)
        .withColumn("asof_ts", col("__f.__asof_ts"))) {
      case (df, (_, to)) => df.withColumn(to, col(s"__f.$to"))
    }

    withPayload.drop("__ts", "__side", "__tb", "__rv", "__m", "__f")
  }

  /** Tolerance-bounded AS-OF join with an additional *time-bucket* partition
    * key — the scale shape for low-cardinality (or empty) key sets, where
    * [[join]]'s per-key window would otherwise funnel all rows through a
    * handful of tasks.
    *
    * Left rows land in bucket `floor(ts / bucketSeconds)`; right rows are
    * replicated into their own bucket and the next one, so a left row near a
    * bucket's start still sees the latest right row from the tail of the
    * previous bucket. Because every match farther than `toleranceSec` in the
    * past is nulled anyway, `toleranceSec <= bucketSeconds` makes the result
    * EXACTLY equal to the unbucketed join — while the shuffle is hash-
    * partitioned on (keys, bucket): parallelism grows with the time span of
    * the data instead of collapsing to one task per key.
    */
  def joinBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Map[String, String],
      toleranceSec: Long,
      bucketSeconds: Long = 86400L,
      rightTieBreak: Option[String] = None): DataFrame = {
    require(toleranceSec <= bucketSeconds,
      s"bucketed ASOF is only exact when toleranceSec ($toleranceSec) <= bucketSeconds ($bucketSeconds)")
    def bucketOf(c: Column) = floor(c.cast("timestamp").cast("long") / bucketSeconds)
    val lb = left.withColumn("__bucket", bucketOf(col(leftTime)))
    val rb0 = right.withColumn("__bucket", bucketOf(col(rightTime)))
    val rb = rb0.unionByName(rb0.withColumn("__bucket", col("__bucket") + 1))
    join(lb, rb, keys :+ "__bucket", leftTime, rightTime, payloadCols,
      Some(toleranceSec), rightTieBreak)
      .drop("__bucket")
  }

  /** NEAREST join: for each left row, the right row with the MINIMUM
    * absolute time distance within the same key — [[join]]'s two-sided
    * sibling (AS-OF looks only backward; sensor/price alignment often
    * wants "closest reading either way"). Same union + ordered window
    * technique, run in BOTH directions over ONE union frame (two windows
    * share the exchange; only the sort differs), so cost stays one hash
    * shuffle + two sorts over |L|+|R| rows — never the per-key cartesian
    * of the naive `abs(dt) <= tol` theta-join.
    *
    * Deterministic choice, mirrorable in ANSI SQL: candidates rank by
    * (|dt| ASC, backward-before-forward at equal distance, tieBreak ASC
    * among equal-timestamp right rows); dt compares in exact MICROSECOND
    * longs (`unix_micros`), never truncated seconds.
    *
    * @param toleranceUs matches farther than this many MICROSECONDS (in
    *                    either direction) are nulled out
    * @param rightTieBreak column ordering right rows that share a
    *                      timestamp; the SMALLEST under this ordering
    *                      wins (required for a deterministic result when
    *                      right timestamps can tie). NULL-timestamp right
    *                      rows are excluded; NULL-timestamp left rows are
    *                      preserved with a NULL match
    * @return left columns + `nearest_ts` + `nearest_dt_us` (signed,
    *         right − left, negative = matched backward) + payloadCols
    */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Map[String, String],
      toleranceUs: Option[Long] = None,
      rightTieBreak: Option[String] = None): DataFrame = {

    val payload = struct(
      (col(rightTime).as("__n_ts") +:
        payloadCols.toSeq.sortBy(_._1).map { case (from, to) =>
          col(from).as(to)
        }): _*)
    val tieBreak = rightTieBreak.map(col).getOrElse(lit(0L))
    // NULL-timestamp right rows can never be a nearest match but would
    // sort nulls-first into the backward scan and surface as a phantom
    // match (payload with NULL nearest_ts) — exclude them up front.
    // NULL-KEY right rows are excluded for the same reason: the key match
    // is SQL equi-join semantics (NULL never matches NULL — mirroring the
    // `p.user_id = v.user_id` oracle form), but the window partition
    // groups NULL keys together, so without this filter a NULL-key left
    // row would <=>-match a NULL-key right row. With right-side NULL keys
    // gone, a NULL-key left row's partition holds no right rows at all
    // and it surfaces with a NULL match — preserved, like every left row.
    val rightU = right
      .filter(col(rightTime).isNotNull &&
        keys.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .select((keys.map(col) :+ unix_micros(col(rightTime)).as("__us") :+
        payload.as("__rv") :+ tieBreak.as("__tb")): _*)
      .withColumn("__side", lit(0))
    val leftU = left
      .withColumn("__us", unix_micros(col(leftTime)))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(rightU.schema("__tb").dataType))
    val unioned = leftU.unionByName(rightU, allowMissingColumns = true)

    // Backward scan: right rows sort before left at equal __us (side 0 <
    // 1) so dt = 0 matches; among right rows tied on __us, __tb DESC puts
    // the SMALLEST tieBreak last, which is what last(ignoreNulls) picks.
    val wBack = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__us").asc, col("__side").asc, col("__tb").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward scan: same frame over the REVERSED time ordering — last
    // non-null is the right row with the smallest __us >= left's.
    val wFwd = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__us").desc, col("__side").asc, col("__tb").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val both = unioned
      .withColumn("__prev", last(col("__rv"), ignoreNulls = true).over(wBack))
      .withColumn("__next", last(col("__rv"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
    val dPrev = col("__us") - unix_micros(col("__prev.__n_ts"))
    val dNext = unix_micros(col("__next.__n_ts")) - col("__us")
    // a NULL-timestamp LEFT row has no defined distance to anything: its
    // match is NULL (the row itself is preserved — left rows always are)
    val chosen = when(col("__us").isNull, lit(null))
      .when(col("__prev").isNotNull && col("__next").isNotNull,
        when(dPrev <= dNext, col("__prev")).otherwise(col("__next")))
      .otherwise(coalesce(col("__prev"), col("__next")))
    val inTol = toleranceUs match {
      case Some(tol) => when(col("__c").isNotNull &&
        abs(unix_micros(col("__c.__n_ts")) - col("__us")) <= tol, col("__c"))
      case None => col("__c")
    }
    val withPayload = payloadCols.toSeq.sortBy(_._1).foldLeft(
      both.withColumn("__c", chosen)
        .withColumn("__f", inTol)
        .withColumn("nearest_ts", col("__f.__n_ts"))
        .withColumn("nearest_dt_us",
          unix_micros(col("__f.__n_ts")) - col("__us"))) {
      case (df, (_, to)) => df.withColumn(to, col(s"__f.$to"))
    }
    withPayload.drop("__us", "__side", "__tb", "__rv", "__prev", "__next",
      "__c", "__f")
  }
}
