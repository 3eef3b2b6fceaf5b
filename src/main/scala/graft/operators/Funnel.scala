package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for a step sequence
  * s₁ → s₂ → … → sₙ, an entity "reaches" step i+1 at the earliest sᵢ₊₁
  * event STRICTLY AFTER its step-i time — the standard product-analytics
  * conversion funnel (each step must happen after the previous one, not
  * merely co-occur; see e.g. the reference's dashboard-style event rollups,
  * `/root/reference/app/streamlit_app.py:79-97`, which this generalizes
  * from single-event counts to ordered sequences).
  *
  * Plan shape (scale story): one entity-keyed aggregate per step plus one
  * entity-keyed equi-join per step — never a window over the full event
  * stream and never a self-join on raw events. Step i's candidate frame is
  * the events of type sᵢ only (the `isin` filter is pushed to the scan, so
  * a 5%-selectivity step reads 5% of the table), joined against the
  * answer-sized per-entity frontier frame (≤ one row per entity that
  * reached step i−1 — AQE broadcasts it when entities are
  * dimension-sized). Every aggregate and every join keys on the SAME
  * entity column, so one hash partitioning serves all 2(n−1)+1 operators
  * and the exchanges after the first are reused, not re-shuffled. At 100 TB
  * the cost is (n) step-filtered scans + one shuffle of the step-filtered
  * events by entity; per-entity state never exceeds n timestamps.
  *
  * Semantics: strict `>` ordering (a click at the exact same microsecond
  * as the signup does not convert), earliest-completion times (min at each
  * step — the canonical "time to convert" definition), and entities enter
  * the funnel only via step 1.
  */
object Funnel {

  /** One row per entity that completed step 1:
    * (`entityCol`, `t_1`, …, `t_n`) where `t_i` is the step-i completion
    * TIMESTAMP (null from the first unreached step on; nulls are suffix-
    * closed — `t_i` null ⇒ `t_{i+1}` null).
    */
  def stepTimes(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps in $steps")
    val e = col(entityCol)
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(e).agg(min(col(tsCol)).as("t_1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (frontier, (step, i)) =>
      val prev = s"t_$i"
      val cur = s"t_${i + 1}"
      val cand = events.filter(col(typeCol) === step)
        .select(e, col(tsCol).as("__ts"))
      val reached = frontier.select(e, col(prev))
        .join(cand, Seq(entityCol))
        .filter(col("__ts") > col(prev))
        .groupBy(e).agg(min(col("__ts")).as(cur))
        .select(e, col(cur))
      frontier.join(reached, Seq(entityCol), "left")
    }
  }

  /** Funnel summary: one row per step —
    * (`step` 1-based, `step_name`, `n_entities` reaching it,
    * `sum_lat_us` total micros from step 1 to this step over the entities
    * that reached it — an exact long, so order-independent; null for
    * step 1). Callers derive rates/averages from the exact counts.
    */
  def summary(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    val times = stepTimes(events, entityCol, tsCol, typeCol, steps)
    // Single pass over the answer-sized step-times frame: one aggregate
    // computing every step's count + latency sum, then unpivoted to a row
    // per step (n is bounded and tiny, so the stack is answer-sized).
    val aggs = steps.indices.flatMap { i =>
      val t = col(s"t_${i + 1}")
      Seq(
        count(t).as(s"__n_${i + 1}"),
        sum(when(t.isNotNull, unix_micros(t) - unix_micros(col("t_1"))))
          .as(s"__l_${i + 1}"))
    }
    val wide = times.agg(aggs.head, aggs.tail: _*)
    val rows = steps.indices.map { i =>
      val lat = if (i == 0) "CAST(NULL AS BIGINT)" else s"__l_${i + 1}"
      s"${i + 1}, '${steps(i).replace("'", "''")}', __n_${i + 1}, $lat"
    }
    wide.selectExpr(
      s"stack(${steps.size}, ${rows.mkString(", ")}) AS (step, step_name, n_entities, sum_lat_us)")
  }
}
