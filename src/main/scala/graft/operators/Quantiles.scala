package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles (`quantile_cont` semantics) in distributed
  * form: pre-aggregate (group, value) counts — a codegen hash aggregate
  * with full map-side combine — then a cumulative-count window over the
  * *distinct values* of each group, reading off the two bracketing values
  * per requested quantile.
  *
  * Versus the built-in `percentile` aggregate (ObjectHashAggregate): the
  * heavy stage stays in whole-stage codegen, the shuffle carries one row
  * per distinct (group, value) instead of per input row, and executor
  * memory is bounded by distinct values rather than group size — the shape
  * that survives groups of 10⁹ rows. The final ordered pass per group is
  * over distinct values only (the irreducible part of an exact quantile).
  *
  * Interpolation matches `Percentile.getPercentile` / DuckDB
  * `quantile_cont`: position p·(n−1); result
  * `(⌈pos⌉ − pos)·v[⌊pos⌋] + (pos − ⌊pos⌋)·v[⌈pos⌉]`.
  */
object Quantiles {

  /** @param df       input rows
    * @param groupCol grouping column name
    * @param valueCol numeric column (cast to double; NULLs ignored)
    * @param ps       (p, output column name) per requested quantile
    * @return one row per group: groupCol, then one double column per p
    */
  def quantileCont(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(Double, String)]): DataFrame = {
    val v = col(valueCol).cast("double")
    val counts = df.filter(v.isNotNull)
      .groupBy(col(groupCol).as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    val staged = counts
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))

    def pos = (n: org.apache.spark.sql.Column) => (c: Double) => lit(c) * (n - 1)
    // value at 0-based sorted index i = first distinct value with cum > i
    val aggs = ps.flatMap { case (p, name) =>
      val pp = pos(col("__n"))(p)
      Seq(
        min(when(col("__cum") > floor(pp), col("__v"))).as(s"__lo_$name"),
        min(when(col("__cum") > ceil(pp), col("__v"))).as(s"__hi_$name"))
    } :+ max(col("__n")).as("__n")

    val outs = ps.map { case (p, name) =>
      val pp = lit(p) * (col("__n") - 1)
      val lower = floor(pp)
      val higher = ceil(pp)
      when(lower === higher, col(s"`__lo_$name`"))
        .otherwise((higher - pp) * col(s"`__lo_$name`") + (pp - lower) * col(s"`__hi_$name`"))
        .as(name)
    }

    staged.groupBy(col("__g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select((col(groupCol) +: outs): _*)
  }

  /** Exact WEIGHTED quantiles per group — order statistics under row
    * weights (mixture weights from [[graft.llm.Mixing]], importance or
    * dedup-count weights), where the unweighted [[quantileCont]] would
    * mis-state every percentile of a weighted corpus:
    *
    *   Q_w(p) = min{ v : Σ_{x ≤ v} w(x) ≥ p·W },   W = Σ w
    *
    * (the lower weighted order statistic — exact, no interpolation).
    * Weights fix-point at scale 4, and the cumulative compare
    * `cumW ≥ ⌈p·W⌉` runs CROSS-MULTIPLIED — `cumW4·den ≥ num·W4`, the
    * exact integer equivalence for positive integers — in DECIMAL(38,0)
    * on both engines (HUGEINT in the twin), so there is no division
    * anywhere, no float threshold edge, and no 2⁵³ headroom caveat:
    * the products stay exact to ~10³⁸ of scaled group weight × den.
    *
    * Plan: one (group, value) weight-sum aggregate (map-side combined,
    * shuffle ∝ distinct values), a cumulative window over each group's
    * DISTINCT VALUES only, then one min-aggregate per (group, p). Same
    * shape as [[quantileCont]]; never a window over raw rows.
    *
    * @param ps (numerator, denominator, outName) per quantile — p as an
    *           exact rational
    * @return per group: (groupCol, then one double column per p) — NULL
    *         for groups with zero total weight
    */
  def weightedQuantile(
      df: DataFrame, groupCols: Seq[String],
      valueCol: org.apache.spark.sql.Column,
      weightCol: org.apache.spark.sql.Column,
      ps: Seq[(Int, Int, String)]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(ps.nonEmpty && ps.forall { case (n, d, _) => n > 0 && n <= d },
      s"quantile rationals must be in (0, 1]: $ps")
    val g = groupCols.map(col)
    val counts = df
      .filter(valueCol.isNotNull && weightCol.isNotNull && weightCol > 0)
      .select(g ++ Seq(valueCol.cast("double").as("__v"),
        floor(weightCol.cast("double") * 10000 + 0.5).cast("long")
          .as("__w4")): _*)
      .groupBy(g :+ col("__v"): _*)
      .agg(sum(col("__w4")).as("__cw"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val cum = counts
      .withColumn("__cum", sum(col("__cw")).over(wCum))
      .withColumn("__tot", sum(col("__cw")).over(wAll))
    val dec38 = (c: org.apache.spark.sql.Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val aggs = ps.map { case (num, den, name) =>
      // cum ≥ ⌈num·W/den⌉  ⟺  cum·den ≥ num·W  (positive integers) —
      // both products exact in DECIMAL(38, 0), no division at all
      min(when(dec38(col("__cum")) * dec38(lit(den.toLong)) >=
        dec38(lit(num.toLong)) * dec38(col("__tot")), col("__v"))).as(name)
    }
    cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Hash-sample quantile estimator WITH its own exactness audit — the
    * mergeable one-pass quantile path for when [[quantileCont]]'s
    * distinct-value pass is still too much (10¹²-row groups, streaming
    * accumulation): estimate quantiles from the k smallest-`md5(salt|id)`
    * rows (a uniform, deterministic, MERGEABLE sample — union two
    * bottom-k sets and re-take k, the [[graft.llm.Splits.bottomK]]
    * convention), then grade each estimate against the FULL data by its
    * exact rank.
    *
    * Estimate = the (⌊p·(m−1)⌋+1)-th smallest sampled value (lower order
    * statistic, m = |sample|); audit = `rank_le/n` vs p (expected error
    * O(1/√k) — reported, not asserted). Everything is integer arithmetic
    * plus the p·(m−1) product, identical cross-engine.
    *
    * Scale: the selection window here is a per-group row_number over raw
    * rows (fine to ~10⁸-row groups); past that, swap in the two-stage
    * bottom-k (per-partition top-k, then merge — the same statistic, by
    * mergeability) without touching the estimator or audit. The audit
    * pass is one broadcast join + hash aggregate over (group, p).
    *
    * @param ps quantile fractions (exact double literals shared with the
    *           SQL twin)
    * @return per (group, p): (groupCols…, p, m, n, rank_le, est,
    *         rank_err) — `est` in original units, `rank_err` =
    *         |rank_le/n − p|
    */
  def sampleQuantileAudit(
      df: DataFrame, groupCols: Seq[String],
      valueCol: org.apache.spark.sql.Column,
      idCol: org.apache.spark.sql.Column,
      k: Int = 256, ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9),
      salt: String = "sq"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(k >= 2, s"sample size k must be >= 2, got $k")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad ps: $ps")
    val spark = df.sparkSession
    import spark.implicits._
    val g = groupCols.map(col)
    val base = df.filter(valueCol.isNotNull)
      .select(g ++ Seq(
        floor(valueCol.cast("double") * 10000 + 0.5).cast("long").as("__v4"),
        md5(concat(lit(s"$salt|"), idCol.cast("string"))).as("__h")): _*)
    val wH = Window.partitionBy(g: _*).orderBy(col("__h").asc)
    val sample = base.withColumn("__rn", row_number().over(wH))
      .filter(col("__rn") <= k)
    val wV = Window.partitionBy(g: _*).orderBy(col("__v4").asc, col("__h").asc)
    val wAll = Window.partitionBy(g: _*)
    val ranked = sample
      .withColumn("__rv", row_number().over(wV).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll))
    val est = ranked.crossJoin(broadcast(ps.toDF("p")))
      .filter(col("__rv") ===
        floor(col("p") * (col("__m") - 1).cast("double")).cast("long") + 1)
      .select(g ++ Seq(col("p"), col("__m").as("m"), col("__v4").as("__e4")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__e_$c")).reduce(_ && _)
    base.join(
        broadcast(est.select(groupCols.map(c => col(c).as(s"__e_$c")) ++
          Seq(col("p"), col("m"), col("__e4")): _*)),
        cond)
      .groupBy(g ++ Seq(col("p"), col("m"), col("__e4")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__v4") <= col("__e4"), 1L).otherwise(0L)).as("rank_le"))
      .select(g ++ Seq(col("p"), col("m"), col("n"), col("rank_le"),
        (col("__e4").cast("double") / 10000.0).as("est"),
        abs(col("rank_le").cast("double") / col("n").cast("double") - col("p"))
          .as("rank_err")): _*)
  }

  /** Distribution-free confidence interval for the MEDIAN per group, from
    * binomial order statistics (the nonparametric companion to
    * [[graft.operators.Bootstrap.meanCI]] — no resampling, no normality,
    * just "which order statistics bracket the median with ≥95%
    * probability"):
    *
    *   lo_rank = max(1, ⌊(n − z·√n)/2⌋),   hi_rank = n + 1 − lo_rank
    *
    * (the standard large-sample binomial bracket; for tiny n the bracket
    * widens to the extremes and nominal coverage is conservative, not
    * guaranteed — documented, not hidden).
    *
    * Exactness: ranks are single double expressions of the exact long n
    * (identical IEEE both engines) floored to longs; bracket values are
    * order-statistic picks over the distinct-value cumulative frame
    * (min v with cum ≥ rank — never an interpolation); the median itself
    * is the exact ×2 order statistic. NULL values are excluded.
    *
    * Plan: one (group, value) count aggregate, cumulative windows over
    * the DISTINCT-value frame only, one group aggregate — the
    * [[quantileCont]] shape.
    *
    * @param z normal quantile for the coverage level (1.96 → 95%)
    * @return per group: (groupCols…, n, lo_rank, hi_rank, ci_lo, median,
    *         ci_hi)
    */
  def medianCI(
      df: DataFrame, groupCols: Seq[String],
      valueCol: org.apache.spark.sql.Column, z: Double = 1.96): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(z > 0, s"z must be positive: $z")
    val g = groupCols.map(col)
    val counts = df.filter(valueCol.isNotNull)
      .select(g :+ floor(valueCol.cast("double") * 10000 + 0.5).cast("long")
        .as("__v4"): _*)
      .groupBy(g :+ col("__v4"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v4"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val staged = counts
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val nD = col("__n").cast("double")
    val lo = greatest(lit(1L),
      floor((nD - lit(z) * sqrt(nD)) / 2.0).cast("long"))
    val hi = col("__n") + 1 - lo
    val mLo = floor((nD + 1.0) / 2.0).cast("long")
    val mHi = floor(nD / 2.0).cast("long") + 1L
    def pick(rank: org.apache.spark.sql.Column) =
      min(when(col("__cum") >= rank, col("__v4")))
    staged.groupBy(g: _*).agg(
        max(col("__n")).as("n"),
        max(lo).as("lo_rank"),
        max(hi).as("hi_rank"),
        pick(lo).as("__lo4"),
        pick(hi).as("__hi4"),
        (pick(mLo) + pick(mHi)).as("__med2"))
      .select(g ++ Seq(col("n"), col("lo_rank"), col("hi_rank"),
        (col("__lo4").cast("double") / 10000.0).as("ci_lo"),
        (col("__med2").cast("double") / 20000.0).as("median"),
        (col("__hi4").cast("double") / 10000.0).as("ci_hi")): _*)
  }
}
