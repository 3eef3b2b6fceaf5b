package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-drift monitoring: per-slice token-distribution divergence — the
  * check a training pipeline runs when a new crawl snapshot, source, or
  * dedup/filter revision lands ("did the token mix move?").
  *
  * [[tokenKlDrift]] computes, for each value of `byCol` (source, snapshot,
  * shard...), the Kullback–Leibler divergence KL(P_s ‖ Q) of the slice's
  * unigram distribution P_s against the whole-corpus distribution Q:
  * Σ_w P_s(w)·ln(P_s(w)/Q(w)). Every slice token is by construction also a
  * corpus token (Q(w) > 0 wherever P_s(w) > 0), so no smoothing is needed
  * — the divergence is finite and zero iff the slice matches the corpus
  * mix exactly.
  *
  * Plan shape (the model-as-a-table idiom, cf. [[LanguageModel]]): one
  * token explode into a (slice, token)-keyed count aggregate with map-side
  * combine — the ONLY stage carrying token volume; slice totals, global
  * token counts, and the corpus total all DERIVE from that type-keyed
  * frame (types ≪ tokens by Heaps' law). The per-term KL contribution is
  * scalar arithmetic on the joined counts.
  *
  * Determinism (the q71 convention): each term is floored at scale 8
  * (`floor(t·10⁸ + 0.5)` as long) so the per-slice SUM is exact long
  * addition — order-independent on any merge tree. The per-term `ln` is
  * the one libm exposure (IEEE does not require correctly-rounded ln); Java
  * and DuckDB agree on every tested corpus, and a third-engine gate should
  * allow ±(distinct terms) on `kl8` rather than assume bit equality.
  */
object Drift {

  /** @param corpus  documents
    * @param textCol whitespace-tokenizable text column
    * @param byCol   slice column (source, snapshot, ...); NULL slices kept
    *                as their own group
    * @return one row per slice: `byCol`, `n_tokens`, `n_types`, `kl8`
    *         (scale-8 integer KL, exact long), `kl4` (double, derived from
    *         kl8 — deterministic)
    */
  def tokenKlDrift(corpus: DataFrame, textCol: String, byCol: String): DataFrame = {
    val tok = corpus.select(col(byCol).as("__slice"),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(col("__w") =!= "")
    val cs = tok.groupBy(col("__slice"), col("__w")).agg(count(lit(1)).as("__c"))
    val ns = cs.groupBy(col("__slice")).agg(sum(col("__c")).as("__n"))
    val cg = cs.groupBy(col("__w")).agg(sum(col("__c")).as("__cg"))
    val m = cs.agg(sum(col("__c")).as("__m"))
    // Null-safe (<=>) slice join: a NULL byCol value IS its own group —
    // groupBy keeps the NULL key, so the totals join must match it too, or
    // the NULL slice would silently vanish here (an equi-join never matches
    // NULL = NULL). The DuckDB twin uses IS NOT DISTINCT FROM for the same
    // reason.
    cs.join(cg, "__w")
      .join(broadcast(ns.withColumnRenamed("__slice", "__slice_n")),
        col("__slice") <=> col("__slice_n"))
      .drop("__slice_n")
      .crossJoin(broadcast(m))
      .withColumn("__t8",
        floor((col("__c").cast("double") / col("__n")) *
          log((col("__c").cast("double") / col("__n")) /
            (col("__cg").cast("double") / col("__m"))) * 100000000L + 0.5)
          .cast("long"))
      .groupBy(col("__slice"))
      .agg(
        max(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__t8")).as("kl8"))
      .withColumn("kl4",
        floor(col("kl8").cast("double") / 100000000L * 10000 + 0.5) / 10000)
      .withColumnRenamed("__slice", byCol)
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group:
    * D = max_v |F_A(v) − F_B(v)| over the pooled distinct values — the
    * nonparametric NUMERIC-drift companion to [[tokenKlDrift]]'s token
    * drift ("did this metric's distribution move between snapshots /
    * slices?"), sensitive to location AND shape with no binning choices.
    *
    * EXACT cross-engine: ECDF differences are compared as the integer
    * cross-product |cumA·n_B − cumB·n_A| (never a float per step), so
    * `d_num` is exact long arithmetic and `d = d_num/(n_A·n_B)` is one
    * IEEE division. Ties are handled by evaluating at DISTINCT values
    * with inclusive cumulative counts — the mathematically correct ECDF
    * under ties.
    *
    * Plan: one (group, value) count aggregate (map-side combined — the
    * only stage carrying row volume), then windows PARTITIONED BY GROUP
    * over the distinct-value frame, then a bounded group aggregate. At
    * 100 TB the distinct-value frame is the only window input; a
    * continuous metric with data-sized distinct counts still windows per
    * group, never globally.
    *
    * @param inSampleA boolean Column: true → sample A, false → sample B;
    *                  null rows (either side) are excluded
    * @return per group: (groupCols…, n_a, n_b, d_num, d); d is NULL when
    *         either sample is empty
    */
  def ksStatistic(
      df: DataFrame, groupCols: Seq[String],
      valueCol: org.apache.spark.sql.Column,
      inSampleA: org.apache.spark.sql.Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val counts = df
      .filter(valueCol.isNotNull && inSampleA.isNotNull)
      .select(g ++ Seq(valueCol.as("__v"),
        inSampleA.cast("boolean").as("__a")): _*)
      .groupBy(g :+ col("__v"): _*)
      .agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("__cb"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    counts
      .select(g ++ Seq(
        sum(col("__ca")).over(wCum).as("__cuma"),
        sum(col("__cb")).over(wCum).as("__cumb"),
        sum(col("__ca")).over(wAll).as("__na"),
        sum(col("__cb")).over(wAll).as("__nb")): _*)
      .groupBy(g: _*)
      .agg(
        max(col("__na")).as("n_a"),
        max(col("__nb")).as("n_b"),
        max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
          .as("d_num"))
      .select(g ++ Seq(
        col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("d_num") / (col("n_a") * col("n_b"))).as("d")): _*)
  }
}
