package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted dataset mixing with fractional up/down-sampling — the corpus
  * assembly step that turns per-source mixture WEIGHTS into rows. A weight
  * `w` for a source means every row of that source is emitted
  * `floor(w)` times plus one more with probability `frac(w)`: w = 2.5 →
  * each row appears 2 or 3 times (expected 2.5), w = 0.25 → each row kept
  * with probability 0.25 (plain downsampling), w = 0 → source dropped.
  *
  * The fractional draw is the same deterministic md5-keyspace primitive as
  * [[Splits]] (`md5(salt|key)` read as a uniform position, compared against
  * a cumulative-fraction hex threshold): a pure function of the row key —
  * zero RNG state, reproducible across engines, partitionings, and cluster
  * sizes, and independent of any other hash-based decision on the same key
  * via the salt. Epoch-level repeats are real training-data semantics
  * (sources are oversampled by DUPLICATION, upweighting their gradient
  * contribution), so the operator emits a `copy_ix` column (1..n) rather
  * than a weight column — downstream shuffling treats copies as rows.
  *
  * Plan shape: scan-time CASE projection + `explode(sequence(1, n))` —
  * a generator that pipelines into the scan, no shuffle, no driver state.
  * Output volume is `Σ w_s·|source_s|` by construction; the explode fans
  * out AT the scan so no stage ever holds more than its input slice times
  * the largest integer weight.
  */
object Mixing {

  /** `df` filtered/replicated per `weights(groupCol)` (missing groups get
    * `defaultWeight`), with `n_copies` (long, this row's realized copy
    * count) and `copy_ix` (long, 1-based copy index) appended.
    */
  def upsampleMix(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      weights: Seq[(String, Double)],
      defaultWeight: Double,
      salt: String = "mix"): DataFrame = {
    require(weights.forall(_._2 >= 0.0), "mixture weights must be >= 0")
    require(defaultWeight >= 0.0, "default weight must be >= 0")
    val clash = df.columns.toSeq.intersect(Seq("n_copies", "copy_ix"))
    require(clash.isEmpty,
      s"upsampleMix input already has reserved column(s) ${clash.mkString(", ")} — " +
        "rename them first (outputs would silently clobber)")

    def intPart(w: Double): Long = math.floor(w).toLong
    def fracThreshold(w: Double): String = Splits.hexThreshold(w - math.floor(w))

    def caseOver[T](f: Double => T, toCol: T => Column): Column =
      weights.foldLeft(Option.empty[Column]) { case (acc, (g, w)) =>
        Some(acc.fold(when(col(groupCol) === g, toCol(f(w))))(
          _.when(col(groupCol) === g, toCol(f(w)))))
      }.fold(toCol(f(defaultWeight)))(_.otherwise(toCol(f(defaultWeight))))

    val bucket = substring(md5(concat(lit(s"$salt|"), col(keyCol).cast("string"))), 1, 8)
    val copies = caseOver[Long](intPart, lit(_)) +
      when(bucket < caseOver[String](fracThreshold, lit(_)), 1L).otherwise(0L)

    df.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy_ix", explode(sequence(lit(1L), col("n_copies"))))
  }

  /** Temperature-scaled mixture resampling — the multilingual/multi-domain
    * rebalancing step (XLM-R / mT5 style): sources are kept with
    * probability proportional to `n_s^alpha / n_s` so that the RESAMPLED
    * mixture follows `p_s ∝ n_s^alpha` — alpha = 1 preserves natural
    * proportions, alpha → 0 flattens toward uniform, boosting low-resource
    * sources' relative share. `targetRows` sets the expected output size:
    * `rate_s = min(1, targetRows · n_s^alpha / Z / n_s)` with
    * `Z = Σ n_t^alpha` (a source too small to fill its quota caps at
    * keep-everything; the realized total then undershoots `targetRows` —
    * resampling never duplicates, use [[upsampleMix]] to oversample).
    *
    * Everything is IN-PLAN: per-source counts (one map-side-combined
    * aggregate, C rows), the normalizer (1 row), and the rates are a
    * broadcast C-row frame joined back onto the scan; the keep decision is
    * the same deterministic `md5(salt|key)` keyspace draw as [[Splits]] —
    * zero RNG state, subset-monotone in `targetRows` (raising the budget
    * strictly grows every source's sample, keeping corpus scale-ups
    * supersets of earlier ones).
    *
    * Cross-engine exactness: with alpha = 0.5 the power is `sqrt` — which
    * IEEE 754 REQUIRES correctly rounded, so rates (and the derived hex
    * thresholds) are bit-identical in any engine. Other alphas go through
    * `pow`, which is not so guaranteed — last-ulp divergence could flip a
    * key sitting exactly on a threshold; prefer 0.5 (the common LLM
    * setting) where cross-engine reproducibility matters.
    */
  def temperatureResample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      alpha: Double,
      targetRows: Long,
      salt: String = "tmp"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    val clash = df.columns.toSeq.intersect(Seq("__ns", "__z", "__rate", "__th"))
    require(clash.isEmpty,
      s"temperatureResample input already has reserved column(s) ${clash.mkString(", ")}")

    def nPow(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else pow(c, lit(alpha))

    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__ns"))
    val z = counts.agg(sum(nPow(col("__ns").cast("double"))).as("__z"))
    val rates = counts.crossJoin(broadcast(z))
      .select(
        col(strataCol),
        least(lit(1.0),
          lit(targetRows.toDouble) * nPow(col("__ns").cast("double")) /
            col("__z") / col("__ns")).as("__rate"))
      .withColumn("__th",
        when(col("__rate") >= 1.0, lit("g")) // sentinel: keep ALL (cf. Splits.hexThreshold)
          .otherwise(format_string("%08x",
            floor(col("__rate") * 4294967296.0).cast("long"))))
    val bucket = substring(md5(concat(lit(s"$salt|"), col(keyCol).cast("string"))), 1, 8)
    df.join(broadcast(rates), Seq(strataCol))
      .filter(bucket < col("__th"))
      .drop("__rate", "__th")
  }

  /** SQL twin of the `n_copies` expression for cross-engine oracles
    * (DuckDB `unnest(generate_series(1, n_copies))` replays the explode;
    * `generate_series(1, 0)` is empty, so zero-copy rows vanish the same
    * way the Spark filter drops them).
    */
  def nCopiesSql(
      keyExprSql: String,
      groupColSql: String,
      weights: Seq[(String, Double)],
      defaultWeight: Double,
      salt: String = "mix"): String = {
    def esc(s: String): String = s.replace("'", "''")
    val intArms = weights.map { case (g, w) =>
      s"WHEN '${esc(g)}' THEN ${math.floor(w).toLong}"
    }.mkString(" ")
    val thrArms = weights.map { case (g, w) =>
      s"WHEN '${esc(g)}' THEN '${Splits.hexThreshold(w - math.floor(w))}'"
    }.mkString(" ")
    s"(CASE $groupColSql $intArms ELSE ${math.floor(defaultWeight).toLong} END" +
      s" + CASE WHEN substr(md5('${esc(salt)}|' || CAST($keyExprSql AS VARCHAR)), 1, 8) < " +
      s"(CASE $groupColSql $thrArms ELSE '${Splits.hexThreshold(defaultWeight - math.floor(defaultWeight))}' END)" +
      " THEN 1 ELSE 0 END)"
  }
}
