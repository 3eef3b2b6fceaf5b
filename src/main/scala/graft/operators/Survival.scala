package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier, JASA 1958) — the
  * right-censoring-aware "how long until the event?" curve behind
  * conversion latency, churn, time-to-first-token, and any funnel step
  * where most subjects HAVEN'T converted yet (a plain average of observed
  * latencies is biased exactly because the slow ones are still running):
  *
  *   Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)
  *
  * with dᵢ events at time tᵢ and nᵢ subjects still at risk (event or
  * censor time ≥ tᵢ).
  *
  * Determinism: the product is computed as exp(Σ ln(1 − dᵢ/nᵢ)) with each
  * log-factor FLOORED AT SCALE 8 (the catalog's ln convention) so the
  * cumulative sum is exact long arithmetic over the window; a dᵢ = nᵢ
  * time (everyone at risk dies) is tracked by an integer flag whose
  * running sum forces Ŝ = 0 exactly from that time on — no −∞ ever enters
  * the arithmetic. `exp` carries the same ±1-ulp caveat as ln, absorbed
  * by the r4 reporting convention.
  *
  * Scale: durations aggregate to one row per (group, duration) FIRST (a
  * map-side-combined hash aggregate), so every window here runs over the
  * distinct-duration frame, not raw subjects; with continuous timestamps
  * distinct durations can approach subject count — bucket durations
  * (seconds/minutes) first at extreme scale, the
  * [[graft.llm.Drift.cusum]] contract.
  *
  * @param durationCol non-negative numeric duration (cast to long)
  * @param eventCol    boolean: true = event observed, false = censored
  * @return one row per (group, event time): (groupCols…, t, d, n_risk,
  *         surv) — censored-only times affect n_risk but emit no row
  */
object Survival {

  def kaplanMeier(
      df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val g = groupCols.map(col)
    val a = df
      .filter(durationCol.isNotNull && eventCol.isNotNull)
      .select(g ++ Seq(durationCol.cast("long").as("t"),
        eventCol.cast("boolean").as("__ev")): _*)
      .groupBy(g :+ col("t"): _*)
      .agg(sum(when(col("__ev"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__c"))
    val wAll = Window.partitionBy(g: _*)
    val wPrev = Window.partitionBy(g: _*).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(g: _*).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.withColumn("n_risk",
        sum(col("__c")).over(wAll) -
          coalesce(sum(col("__c")).over(wPrev), lit(0L)))
      .withColumn("__zf", when(col("d") === col("n_risk"), 1L).otherwise(0L))
      .withColumn("__t8",
        when(col("d") < col("n_risk"),
          floor(log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double")) * lit(1e8) + 0.5).cast("long"))
          .otherwise(0L))
      .withColumn("__zcum", sum(col("__zf")).over(wCum))
      .withColumn("__s8", sum(col("__t8")).over(wCum))
      .filter(col("d") >= 1)
      .select(g ++ Seq(col("t"), col("d"), col("n_risk"),
        when(col("__zcum") > 0, lit(0.0))
          .otherwise(exp(col("__s8").cast("double") / lit(1e8))).as("surv")): _*)
  }

  /** Log-rank test (Mantel 1966) per stratum — "do cohorts A and B have
    * the SAME survival curve?", the hypothesis-test companion to
    * [[kaplanMeier]] (an A/B test on time-to-event that a mean-latency
    * t-test gets wrong under censoring):
    *
    *   Z² = (Σ_t (d_A − d·n_A/n))² / Σ_t d·(n_A/n)·(n_B/n)·(n−d)/(n−1)
    *
    * over pooled event times (χ²₁ under H₀). Each O−E and variance term
    * floors at scale 8 (fixed double expression over exact integer
    * counts) so the sums are exact longs; the final Z² is one mirrored
    * double expression. Same plan as [[kaplanMeier]]: one (stratum, t)
    * aggregate, windows over that distinct-time frame only.
    *
    * @param inCohortA boolean: true → cohort A, false → B
    * @return per stratum: (groupCols…, n_a, n_b, o_a, e_a8, v8, z2) —
    *         z2 NULL when the variance sum is 0 (no informative times)
    */
  def logRank(
      df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column,
      inCohortA: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val g = groupCols.map(col)
    val a = df
      .filter(durationCol.isNotNull && eventCol.isNotNull &&
        inCohortA.isNotNull)
      .select(g ++ Seq(durationCol.cast("long").as("t"),
        eventCol.cast("boolean").as("__ev"),
        inCohortA.cast("boolean").as("__a")): _*)
      .groupBy(g :+ col("t"): _*)
      .agg(
        sum(when(col("__a") && col("__ev"), 1L).otherwise(0L)).as("__da"),
        sum(when(!col("__a") && col("__ev"), 1L).otherwise(0L)).as("__db"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("__ca"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__cb"))
    val wAll = Window.partitionBy(g: _*)
    val wPrev = Window.partitionBy(g: _*).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    def atRisk(cnt: String) =
      sum(col(cnt)).over(wAll) - coalesce(sum(col(cnt)).over(wPrev), lit(0L))
    val withRisk = a
      .withColumn("__na", atRisk("__ca"))
      .withColumn("__nb", atRisk("__cb"))
      .withColumn("__tot_a", sum(col("__ca")).over(wAll))
      .withColumn("__tot_b", sum(col("__cb")).over(wAll))
      .withColumn("__d", col("__da") + col("__db"))
      .withColumn("__n", col("__na") + col("__nb"))
      .filter(col("__d") >= 1)
    val nD = col("__n").cast("double")
    val oe = col("__da").cast("double") -
      col("__d").cast("double") * col("__na").cast("double") / nD
    val vt = col("__d").cast("double") *
      (col("__na").cast("double") / nD) * (col("__nb").cast("double") / nD) *
      ((col("__n") - col("__d")).cast("double") / (nD - 1.0))
    withRisk
      .withColumn("__oe8", floor(oe * lit(1e8) + 0.5).cast("long"))
      .withColumn("__v8",
        when(col("__n") > 1, floor(vt * lit(1e8) + 0.5).cast("long"))
          .otherwise(0L))
      .groupBy(g: _*)
      .agg(
        max(col("__tot_a")).as("__xna"), // constant per group
        max(col("__tot_b")).as("__xnb"),
        sum(col("__da")).as("o_a"),
        sum(col("__oe8")).as("e_a8"),
        sum(col("__v8")).as("v8"))
      .select(g ++ Seq(col("__xna").as("n_a"), col("__xnb").as("n_b"),
        col("o_a"), col("e_a8"), col("v8"),
        when(col("v8") > 0,
          (col("e_a8").cast("double") / lit(1e8)) *
            (col("e_a8").cast("double") / lit(1e8)) /
            (col("v8").cast("double") / lit(1e8))).as("z2")): _*)
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978) per group —
    * [[kaplanMeier]]'s ADDITIVE sibling: instead of the survival product,
    * the cumulative hazard
    *
    *   Ĥ(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ
    *
    * whose increments read directly as instantaneous risk ("0.4% of
    * still-at-risk sessions convert per minute here") and whose sums are
    * the natural input to hazard-ratio eyeballing between cohorts.
    *
    * Determinism: each dᵢ/nᵢ is ONE double division of exact longs
    * floored at scale 8 into a LONG, so the cumulative `h8` is exact
    * integer window arithmetic (the [[kaplanMeier]] log-sum convention
    * without the log — no ulp caveat at all here); `chaz = h8/1e8` is one
    * fixed double tail. Censored-only times affect n_risk but emit no
    * row (the KM convention).
    *
    * Plan: identical to [[kaplanMeier]] — one (group, duration) hash
    * aggregate, then windows over the distinct-duration frame only; the
    * same bucket-durations-first contract applies at extreme scale.
    *
    * @return one row per (group, event time): (groupCols…, t, d, n_risk,
    *         h8, chaz)
    */
  def nelsonAalen(
      df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val g = groupCols.map(col)
    val a = df
      .filter(durationCol.isNotNull && eventCol.isNotNull)
      .select(g ++ Seq(durationCol.cast("long").as("t"),
        eventCol.cast("boolean").as("__ev")): _*)
      .groupBy(g :+ col("t"): _*)
      .agg(sum(when(col("__ev"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__c"))
    val wAll = Window.partitionBy(g: _*)
    val wPrev = Window.partitionBy(g: _*).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(g: _*).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.withColumn("n_risk",
        sum(col("__c")).over(wAll) -
          coalesce(sum(col("__c")).over(wPrev), lit(0L)))
      .withColumn("__t8",
        floor(col("d").cast("double") / col("n_risk").cast("double") *
          lit(1e8) + 0.5).cast("long"))
      .withColumn("h8", sum(col("__t8")).over(wCum))
      .filter(col("d") >= 1)
      .select(g ++ Seq(col("t"), col("d"), col("n_risk"), col("h8"),
        (col("h8").cast("double") / lit(1e8)).as("chaz")): _*)
  }
}
