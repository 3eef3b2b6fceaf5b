package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage scoring (Fellegi & Sunter,
  * JASA 1969) — the classical decision layer on top of blocking
  * ([[SortedNeighborhood]], q48's key blocking) and similarity kernels
  * (Jaro–Winkler, edit distance): each compared field contributes a
  * log-likelihood-ratio weight
  *
  *   agree:    log₂(m/u)          (m = P(agree | match),
  *   disagree: log₂((1−m)/(1−u))   u = P(agree | non-match))
  *
  * and the pair's score is the sum over fields; two thresholds split
  * match / possible (clerical review) / non-match.
  *
  * Determinism: the weights are SCALA-SIDE constants (computed once from
  * the m/u parameters — exposed via [[fsWeights]] so SQL twins interpolate
  * bit-identical literals); the score is a fixed left-to-right sum of
  * CASE-picked constants, so both engines produce identical doubles. A
  * NULL agreement (missing field) contributes 0 — the standard
  * missing-at-random treatment.
  *
  * Scale: pure per-row projection over an already-blocked pair frame —
  * no join, no shuffle, no state; the blocking stage owns the quadratic
  * risk (and is separately plan-pinned).
  */
object RecordLinkage {

  /** (agreeWeight, disagreeWeight) = (log₂(m/u), log₂((1−m)/(1−u))). */
  def fsWeights(m: Double, u: Double): (Double, Double) = {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m/u out of (0,1): m=$m u=$u")
    require(m > u, s"need m > u for a discriminating field: m=$m u=$u")
    (math.log(m / u) / math.log(2.0),
      math.log((1 - m) / (1 - u)) / math.log(2.0))
  }

  /** Score blocked pairs.
    *
    * @param pairs  candidate pair frame (one row per pair, attributes of
    *               both sides already attached)
    * @param fields per-field (name, agreement Column, m, u); the boolean
    *               agreement expression is evaluated per pair, NULL = missing
    * @param upper  score ≥ upper → "match"
    * @param lower  score ≤ lower → "non_match" (else "possible")
    * @return pairs plus (agree_<name>… boolean per field, score, verdict)
    */
  def fellegiSunter(
      pairs: DataFrame,
      fields: Seq[(String, Column, Double, Double)],
      upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one compared field")
    require(lower <= upper, s"lower $lower must be <= upper $upper")
    val flagged = fields.foldLeft(pairs) { case (df, (name, agree, _, _)) =>
      df.withColumn(s"agree_$name", agree.cast("boolean"))
    }
    val score = fields.map { case (name, _, m, u) =>
      val (wA, wD) = fsWeights(m, u)
      when(col(s"agree_$name").isNull, lit(0.0))
        .when(col(s"agree_$name"), lit(wA)).otherwise(lit(wD))
    }.reduce(_ + _)
    flagged
      .withColumn("score", score)
      .withColumn("verdict",
        when(col("score") >= upper, "match")
          .when(col("score") <= lower, "non_match")
          .otherwise("possible"))
  }
}
