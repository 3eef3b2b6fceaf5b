package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Funnel, Retention}

/** Behavioral-analytics operators: ordered funnels and cohort retention. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel stepTimes: strict ordering, earliest completion, suffix nulls") {
    val events = Seq(
      // u1 completes all three steps, with a decoy earlier purchase that
      // precedes its click and must NOT count (ordering is per-step).
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:30:00"), "purchase"), // before click → ignored
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (1L, ts("2024-01-01 13:00:00"), "click"), // later click → not earliest
      // u2 clicks BEFORE signing up → never reaches step 2.
      (2L, ts("2024-01-02 09:00:00"), "click"),
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      // u3: click at the EXACT signup instant → strict > rejects it.
      (3L, ts("2024-01-03 10:00:00"), "signup"),
      (3L, ts("2024-01-03 10:00:00"), "click"),
      // u4 never signs up → not in the funnel at all.
      (4L, ts("2024-01-04 10:00:00"), "click"),
      (4L, ts("2024-01-04 11:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val t = Funnel.stepTimes(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    assert(t.keySet == Set(1L, 2L, 3L))
    assert(t(1L) == (Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 11:00:00")), Some(ts("2024-01-01 12:00:00"))))
    assert(t(2L) == (Some(ts("2024-01-02 10:00:00")), None, None))
    assert(t(3L) == (Some(ts("2024-01-03 10:00:00")), None, None))
  }

  test("funnel summary: per-step reach counts and exact step-1 latency sums") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 10:30:00"), "click"),
      (3L, ts("2024-01-03 10:00:00"), "signup")
    ).toDF("user_id", "ts", "event_type")
    val rows = Funnel.summary(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .orderBy("step").collect()
    assert(rows.map(_.getInt(0)).sameElements(Array(1, 2, 3)))
    assert(rows.map(_.getString(1)).sameElements(Array("signup", "click", "purchase")))
    assert(rows.map(_.getLong(2)).sameElements(Array(3L, 2L, 1L)))
    assert(rows(0).isNullAt(3))
    // u1: 1h, u2: 30min → 90 min in micros; purchase: u1 2h from signup.
    assert(rows(1).getLong(3) == 90L * 60 * 1000000)
    assert(rows(2).getLong(3) == 120L * 60 * 1000000)
  }

  test("funnel rejects duplicate steps") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), "a")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.stepTimes(df, "user_id", "ts", "event_type", Seq("a", "b", "a"))
    }
  }

  test("retention cohorts: epoch-anchored weeks, offset-0 = cohort size") {
    // Epoch week w covers days [7w, 7w+7). 2024-01-01 is day 19723 → week 2817
    // (19723 div 7 = 2817, days 19719–19725 → 2024-12-28…2024-01-03).
    val events = Seq(
      // u1 first seen week A, active weeks A, A+1, A+3.
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-22 10:00:00")),
      // u2 first seen week A, active only week A (two events, one distinct).
      (2L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      // u3 first seen week A+1, active weeks A+1 and A+2.
      (3L, ts("2024-01-08 10:00:00")),
      (3L, ts("2024-01-15 10:00:00"))
    ).toDF("user_id", "ts")
    val weekA = 19723L / 7 // 2024-01-01's epoch week
    val got = Retention.cohorts(events, "user_id", "ts", periodDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (weekA, 0L) -> 2L, (weekA, 1L) -> 1L, (weekA, 3L) -> 1L,
      (weekA + 1, 0L) -> 1L, (weekA + 1, 1L) -> 1L))
  }

  test("retention cohorts: daily periods and positive-period guard") {
    val events = Seq(
      (1L, ts("2024-01-01 01:00:00")),
      (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-03 01:00:00"))
    ).toDF("user_id", "ts")
    val got = Retention.cohorts(events, "user_id", "ts", periodDays = 1)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 1L, 2L -> 1L))
    intercept[IllegalArgumentException] {
      Retention.cohorts(events, "user_id", "ts", periodDays = 0)
    }
  }

  // -------------------------------------------------- Retention.streaks

  test("streaks: gaps-and-islands longest run; same-period repeats collapse") {
    import graft.operators.Retention
    def day(d: Int, h: Int = 0) =
      new Timestamp((d * 86400L + h * 3600L) * 1000L)
    // A: days {0,1,2, 5,6} (+ a repeat on day 1) → max streak 3 of 5
    // B: day {10} only → 1 of 1
    val events = Seq(
      (1L, day(0)), (1L, day(1)), (1L, day(1, 5)), (1L, day(2)),
      (1L, day(5)), (1L, day(6)),
      (2L, day(10))
    ).toDF("user_id", "ts")
    val got = Retention.streaks(events, "user_id", "ts", periodDays = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_periods"), r.getAs[Long]("max_streak"))).toMap
    assert(got(1L) == ((5L, 3L)))
    assert(got(2L) == ((1L, 1L)))
  }

  // ---------------------------------------------- Concurrency.maxConcurrent

  test("maxConcurrent: sweep-line peak with first-reach time; half-open boundaries") {
    import graft.operators.Concurrency
    // [1,5), [2,4), [3,6): live counts 1,2,3… → peak 3 first reached at t=3
    val df = Seq(("g", 1L, 5L), ("g", 2L, 4L), ("g", 3L, 6L)).toDF("g", "s", "e")
    val Array(r) = Concurrency.maxConcurrent(df, Seq("g"), col("s"), col("e"))
      .collect()
    assert(r.getAs[Long]("n_intervals") == 3L)
    assert(r.getAs[Long]("peak") == 3L && r.getAs[Long]("peak_at") == 3L)

    // half-open: [1,3) then [3,5) never overlap → peak 1 at t=1;
    // the zero-length [7,7) interval is excluded entirely
    val touch = Seq(("h", 1L, 3L), ("h", 3L, 5L), ("h", 7L, 7L))
      .toDF("g", "s", "e")
    val Array(t) = Concurrency.maxConcurrent(touch, Seq("g"), col("s"), col("e"))
      .collect()
    assert(t.getAs[Long]("n_intervals") == 2L)
    assert(t.getAs[Long]("peak") == 1L && t.getAs[Long]("peak_at") == 1L)
  }

  // -------------------------------------------------- Survival.kaplanMeier

  test("kaplanMeier: textbook curve with censoring; censored-only times emit no row") {
    import graft.operators.Survival
    // A(1, ev), B(2, cens), C(3, ev), D(3, ev), E(5, cens):
    //   t=1: n=5, d=1 → S = 4/5; t=3: n=3, d=2 → S = 4/5 · 1/3 = 4/15
    val df = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true),
      ("g", 3L, true), ("g", 5L, false)).toDF("g", "dur", "ev")
    val out = Survival.kaplanMeier(df, Seq("g"), col("dur"), col("ev"))
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    assert(out.keySet == Set(1L, 3L)) // t=2 and t=5 are censor-only
    assert(out(1L).getAs[Long]("n_risk") == 5L && out(1L).getAs[Long]("d") == 1L)
    assert(math.abs(out(1L).getAs[Double]("surv") - 0.8) < 1e-7)
    assert(out(3L).getAs[Long]("n_risk") == 3L && out(3L).getAs[Long]("d") == 2L)
    assert(math.abs(out(3L).getAs[Double]("surv") - 4.0 / 15) < 1e-7)
  }

  test("kaplanMeier: exhausted risk set pins the curve to exactly 0") {
    import graft.operators.Survival
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("g", 2L, true))
      .toDF("g", "dur", "ev")
    val out = Survival.kaplanMeier(df, Seq("g"), col("dur"), col("ev"))
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Double]("surv")).toMap
    assert(math.abs(out(1L) - 2.0 / 3) < 1e-7)
    assert(out(2L) == 0.0) // d = n_risk → exact zero, not exp(−∞)
  }

  test("nelsonAalen: cumulative d/n hazard; censor-only times emit no row") {
    import graft.operators.Survival
    // (1, ev), (2, cens), (3, ev), (3, ev): Ĥ(1) = 1/4 = 0.25;
    // t=2 censors silently; Ĥ(3) = 0.25 + 2/2 = 1.25 — exact h8 longs.
    val df = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true),
      ("g", 3L, true)).toDF("g", "dur", "ev")
    val out = Survival.nelsonAalen(df, Seq("g"), col("dur"), col("ev"))
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L).getAs[Long]("n_risk") == 4L)
    assert(out(1L).getAs[Long]("h8") == 25000000L)
    assert(out(1L).getAs[Double]("chaz") == 0.25)
    assert(out(3L).getAs[Long]("n_risk") == 2L)
    assert(out(3L).getAs[Long]("h8") == 125000000L)
    assert(out(3L).getAs[Double]("chaz") == 1.25)
  }

  test("logRank: identical cohorts score 0; hand-computed separation") {
    import graft.operators.Survival
    // symmetric cohorts → every O−E term is exactly 0
    val sym = Seq((1L, true), (2L, false), (3L, true))
      .flatMap { case (t, e) => Seq(("s", t, e, true), ("s", t, e, false)) }
      .toDF("s", "dur", "ev", "a")
    val Array(z0) = Survival.logRank(sym, Seq("s"), col("dur"), col("ev"),
      col("a")).collect()
    assert(z0.getAs[Long]("e_a8") == 0L && z0.getAs[Double]("z2") == 0.0)

    // A dies at t=1 (×3), B censored at t=10 (×3):
    //   one event time: O−E = 3 − 3·3/6 = 1.5, V = 3·½·½·(3/5) = 0.45
    //   → Z² = 1.5²/0.45 = 5
    val sep = (Seq.fill(3)(("s", 1L, true, true)) ++
      Seq.fill(3)(("s", 10L, false, false))).toDF("s", "dur", "ev", "a")
    val Array(z) = Survival.logRank(sep, Seq("s"), col("dur"), col("ev"),
      col("a")).collect()
    assert(z.getAs[Long]("n_a") == 3L && z.getAs[Long]("n_b") == 3L)
    assert(z.getAs[Long]("o_a") == 3L)
    assert(z.getAs[Long]("e_a8") == 150000000L)
    assert(z.getAs[Long]("v8") == 45000000L)
    assert(math.abs(z.getAs[Double]("z2") - 5.0) < 1e-9)
  }
}
