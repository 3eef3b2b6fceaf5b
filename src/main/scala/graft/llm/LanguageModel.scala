package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical n-gram language-model scoring — the corpus-quality signal
  * real pipelines compute with a KenLM-style model: documents whose token
  * transitions are improbable under a reference model are gibberish,
  * boilerplate, or the wrong language, and get filtered or down-weighted.
  * Here the model is a bigram MLE trained ON a reference corpus (possibly
  * the corpus itself — self-scoring flags outlier documents), and scoring
  * is a pure DataFrame pipeline: the model IS a table, scoring IS a join.
  *
  * Scale shape: training = one explode into bigram shingles + two hash
  * aggregates (bigram counts, then prefix totals — both map-side
  * combinable). Scoring = re-explode the target docs, equi-join the model
  * on the bigram (a shuffle join by default — a real model is 10⁸⁺ rows
  * and not broadcastable; AQE demotes to broadcast when it is small),
  * then one per-document aggregate. No driver-side model artifact at all —
  * unlike the IVF quantizer there is no k-row bottleneck to collect;
  * the model stays distributed end to end.
  *
  * Determinism: per-bigram log-probabilities are rounded to scale-4 LONGS
  * (`floor(ln(p)·10⁴ + 0.5)`) BEFORE the per-document sum, so the sum is
  * exact integer arithmetic — order-independent on any merge tree — and
  * the cross-engine twin reproduces it bit-for-bit (same convention as
  * the catalog's money aggregates).
  */
object LanguageModel {

  /** Bigram model of `corpus`: one row per distinct bigram with
    * `w12` (the space-joined bigram), `c12` (its occurrence count) and
    * `c1` (occurrences of its prefix word as a bigram start — the MLE
    * denominator, so P(w2|w1) = c12/c1).
    */
  def bigramModel(corpus: DataFrame, textCol: String): DataFrame = {
    val bi = corpus.select(
      explode(graft.functions.TextExprs.wordShingles(col(textCol), 2)).as("w12"))
    val counts = bi.groupBy(col("w12")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("w12"), " ", 1))
    val prefix = counts.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    counts.join(prefix, "w1").select(col("w12"), col("c12"), col("c1"))
  }

  /** Score `docs` under `model` ([[bigramModel]] output): one row per
    * document having ≥1 bigram — `n_bigrams`, `logsum4` (sum of scale-4
    * rounded bigram log-probs, exact long), and `avg_logp` (mean log-prob
    * per bigram, scale-4). Bigrams absent from the model are dropped by
    * the join, so `n_bigrams` counts SCORED bigrams (with a self-trained
    * model that is all of them); under a foreign model, compute each
    * document's total bigram count separately
    * (`size(wordShingles(text, 2))`) and gate on the coverage ratio
    * before trusting `avg_logp`.
    *
    * Cross-engine caveat: the scale-4 floor makes the SUM order-independent
    * (exact long addition), but each per-bigram term still passes through
    * `ln` — and IEEE 754 does not require correctly-rounded `ln`, so an
    * engine pair whose libm implementations disagree in the last ulp could
    * round a log-prob landing within an ulp of an integer scale-4 boundary
    * to adjacent longs. Java's `Math.log` and DuckDB's libm agree on every
    * value in the test corpora (q71 hash-matches at three SFs); a gate
    * comparing against a third engine should allow ±1 on `logsum4` rather
    * than assume bit equality.
    */
  def scoreBigrams(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val docBi = docs.select(col(idCol),
      explode(graft.functions.TextExprs.wordShingles(col(textCol), 2)).as("w12"))
    docBi.join(model, "w12")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(floor(log(col("c12").cast("double") / col("c1").cast("double")) * 10000 + 0.5)
          .cast("long")).as("logsum4"))
      .withColumn("avg_logp",
        floor((col("logsum4").cast("double") / 10000.0 / col("n_bigrams")) * 10000 + 0.5) / 10000)
  }
}
