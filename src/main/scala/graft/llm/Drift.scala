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
}
