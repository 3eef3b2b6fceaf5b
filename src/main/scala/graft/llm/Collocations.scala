package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** word2phrase-style collocation mining — the phrase-detection pass that
  * tokenizer/vocabulary pipelines run before training ("new york" →
  * "new_york"): score each adjacent word pair by how much more often it
  * occurs than its parts predict, keep pairs above a count floor, rank by
  * score. The scoring rule is the word2vec phrase score
  * `score(a,b) = (c_ab − δ) · N / (c_a · c_b)` (Mikolov et al. 2013,
  * "Distributed Representations of Words and Phrases", §4): a PMI-shaped
  * ratio with a discount δ that suppresses rare-pair noise. Reference
  * analog: none — this is part of the LLM-pipeline surface beyond the
  * reference's own operators.
  *
  * Scale shape: three independent aggregate subtrees off the same scan —
  * bigram counts (explode word 2-shingles → hash agg), unigram counts
  * (explode words → hash agg), and the corpus token total (a zero-join
  * scan agg) — then the bigram table joins the unigram table TWICE (once
  * per side of the pair) on the word key. All three aggregates are
  * map-side combinable; the unigram join is a shuffle join by design
  * (a 10⁷-word vocabulary is a table, not a broadcast), and the joined
  * stream is already aggregated — |bigram types| rows, not token volume.
  * The subtrees are deliberately independent rather than derived from one
  * another (e.g. unigram counts COULD be re-aggregated from bigram counts):
  * independent subtrees schedule in parallel, and chaining consumers onto
  * one exchange serializes the stage DAG for no byte savings that matters
  * — the same measured trade documented for q80 in SCALE.md.
  *
  * Determinism: all counts are exact longs; the score is scalar double
  * arithmetic over those longs (identical cross-engine per the catalog
  * convention) rounded to 4 decimals with the shared `floor(x·10⁴+0.5)`
  * rule before ordering, so ranking ties are engine-stable.
  */
object Collocations {

  /** Collocation table over `docs(textCol)`: one row per adjacent word
    * pair with `c12 ≥ minCount` — `w1`, `w2`, `c12`, `c1`, `c2`, and the
    * discounted phrase `score4` (4-decimal). Tokens are `sep`-separated
    * (the corpus convention everywhere else in this library); the last
    * word of each document does not start a pair, mirroring word2phrase's
    * sentence-boundary behavior.
    */
  def phraseScores(
      docs: DataFrame, textCol: String,
      minCount: Long = 5, delta: Double = 1.0,
      sep: String = " "): DataFrame = {
    val big = docs.select(
        explode(graft.functions.TextExprs.wordShingles(col(textCol), 2)).as("w12"))
      .groupBy(col("w12")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .select(
        substring_index(col("w12"), sep, 1).as("w1"),
        substring_index(col("w12"), sep, -1).as("w2"),
        col("c12"))
    val uni = docs.select(explode(split(col(textCol), sep)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = docs.agg(
      sum(size(split(col(textCol), sep))).as("n_tokens"))
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .select(
        col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        (floor(
          ((col("c12") - lit(delta)) * col("n_tokens")) /
            (col("c1").cast("double") * col("c2").cast("double")) * 10000 + 0.5)
          / 10000).as("score4"))
  }
}
