package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: group entities by WHEN THEY FIRST APPEARED
  * (the cohort) and count how many are still active k periods later — the
  * standard "week-0/week-1/…" retention triangle behind every activity
  * dashboard (generalizing the reference's per-month activity rollups,
  * `/root/reference/app/streamlit_app.py:79-97`, from calendar buckets to
  * first-seen-anchored buckets).
  *
  * Period arithmetic is PURE INTEGER — `period = epoch_micros ÷ µs-per-day
  * ÷ days-per-period` (floor division on non-negative longs) — so cohort
  * keys and offsets are bit-identical in any engine and under any
  * partitioning; no calendar/`date_trunc` semantics (whose week-start and
  * timezone conventions differ across engines) are involved. Periods are
  * epoch-anchored (period 0 starts 1970-01-01), so bucket boundaries never
  * shift as data arrives.
  *
  * Plan shape (scale story): one entity-keyed aggregate (first-seen), one
  * entity-keyed equi-join back onto the events (same key ⇒ the aggregate's
  * partitioning is reused; AQE broadcasts the answer-sized first-seen frame
  * when entities are dimension-sized), then one (cohort, offset, entity)
  * DISTINCT + count, which map-side partially aggregates to at most
  * |entities| × |periods| rows — never a window, never a self-join of raw
  * events. At 100 TB: two shuffles (entity, then cohort×offset), both on
  * keys whose cardinality is entity-bounded, not event-bounded.
  */
object Retention {

  private val MicrosPerDay = 86400000000L

  /** Retention counts: one row per (cohort, offset) —
    * (`cohort` = first-seen period index, `offset` = periods since the
    * entity's first event, `n_entities` distinct entities from that cohort
    * active at that offset). `offset = 0` rows give each cohort's size.
    * `periodDays` is the bucket width (7 = weekly retention).
    */
  def cohorts(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, s"periodDays must be positive, got $periodDays")
    val e = col(entityCol)
    // Floor division is monotone in ts, so each entity's cohort (the period
    // of its first event) is simply its MIN period — no timestamp min +
    // re-derivation needed.
    val withPeriod = events.select(e,
      expr(s"unix_micros(`$tsCol`) div $MicrosPerDay div $periodDays").as("__p"))
    val first = withPeriod.groupBy(e).agg(min(col("__p")).as("cohort"))
    withPeriod
      .join(first, Seq(entityCol))
      .select(e, col("cohort"), (col("__p") - col("cohort")).as("offset"))
      .groupBy(col("cohort"), col("offset"))
      .agg(countDistinct(e).as("n_entities"))
  }

  /** Longest consecutive-activity streak per entity — the gaps-and-islands
    * loyalty statistic ("how many straight weeks was each user active?")
    * that [[cohorts]]' triangle can't read off (retention says "active at
    * offset k", a streak says "active at EVERY offset up to k"):
    *
    *   island = period − rank(period)   (constant within a consecutive run)
    *
    * over each entity's DISTINCT periods, then the max run length. Same
    * pure-integer epoch-anchored period arithmetic as [[cohorts]] — no
    * calendar semantics, engine-identical.
    *
    * Plan: one (entity, period) distinct aggregate (map-side combined —
    * shuffle ∝ entity×period, event volume never windows), one
    * entity-keyed rank window over that distinct frame, two more
    * entity-bounded aggregates. At 100 TB: everything after the first
    * aggregate is entity×period-sized.
    *
    * @return per entity: (entityCol, n_periods, max_streak)
    */
  def streaks(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, s"periodDays must be positive, got $periodDays")
    import org.apache.spark.sql.expressions.Window
    val e = col(entityCol)
    val periods = events.select(e,
      expr(s"unix_micros(`$tsCol`) div $MicrosPerDay div $periodDays").as("__p"))
      .groupBy(e, col("__p")).agg(count(lit(1)).as("__dummy"))
      .drop("__dummy")
    val w = Window.partitionBy(e).orderBy(col("__p").asc)
    periods
      .withColumn("__isl", col("__p") - row_number().over(w))
      .groupBy(e, col("__isl"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(e)
      .agg(sum(col("__len")).as("n_periods"), max(col("__len")).as("max_streak"))
  }
}
