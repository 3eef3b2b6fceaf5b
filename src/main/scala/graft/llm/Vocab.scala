package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary building + OOV truncation — the classic LM
  * preprocessing step: build the token vocabulary from the corpus itself
  * (frequency-thresholded), then rewrite every document replacing
  * out-of-vocabulary tokens with a sentinel (`<unk>`), carrying token/OOV
  * counts for profiling. What word-level LM pipelines (and BPE trainers'
  * pre-tokenization stage) do before any model sees the text.
  *
  * Scale shape: the vocabulary is a DISTRIBUTED table (a 10⁷-term vocab is
  * not a driver artifact) built with one map-side-combined aggregate. The
  * rewrite posexplodes the token stream, LEFT-joins the vocab on the token
  * (shuffle join by design — AQE demotes it to broadcast when the vocab is
  * actually small), and reassembles each document with a per-doc sorted
  * collect — the token stream shuffles twice (join + reassembly), which is
  * the honest cost of a per-token rewrite against an unbounded vocabulary;
  * there is no all-pairs anywhere.
  *
  * Determinism: token positions from `posexplode` make the reassembly
  * order exact (`array_sort` on (pos, token) structs, positions unique),
  * so `new_text` is byte-identical on any partitioning and cross-engine
  * (`string_agg(... ORDER BY pos)` twin).
  */
object Vocab {

  /** Tokens with absolute count >= `minCount`: (token, n). */
  def build(
      docs: DataFrame, textCol: Column, minCount: Long,
      tokenSep: String = " "): DataFrame =
    docs.select(explode(split(textCol, tokenSep)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)

  /** Tokens whose count is at least `fraction` of the total token count —
    * the scale-free form: the same `fraction` keeps the same RELATIVE
    * vocabulary as the corpus grows, where an absolute `minCount` tuned at
    * one scale degenerates (everything OOV / nothing OOV) at another. The
    * total arrives as a broadcast 1-row frame; `n >= fraction · total` is
    * plain IEEE arithmetic, identical in any engine.
    */
  def buildRelative(
      docs: DataFrame, textCol: Column, fraction: Double,
      tokenSep: String = " "): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0,1], got $fraction")
    val cnt = docs.select(explode(split(textCol, tokenSep)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum(col("n")).as("__tt"))
    cnt.crossJoin(broadcast(tot))
      .filter(col("n") >= lit(fraction) * col("__tt"))
      .select(col("token"), col("n"))
  }

  /** Rewrite `docs`, replacing tokens absent from `vocab` (a (token, …)
    * frame, e.g. [[build]]/[[buildRelative]] output) with `unk`:
    * (idCol, new_text, n_tokens, n_oov).
    */
  def truncateToVocab(
      docs: DataFrame, idCol: String, textCol: Column,
      vocab: DataFrame, unk: String = "<unk>",
      tokenSep: String = " "): DataFrame = {
    val tok = docs.select(col(idCol),
      posexplode(split(textCol, tokenSep)).as(Seq("pos", "token")))
    val marked = tok
      .join(vocab.select(col("token"), lit(true).as("__in")), Seq("token"), "left")
      .select(col(idCol), col("pos"),
        when(col("__in").isNull, lit(unk)).otherwise(col("token")).as("tk"),
        col("__in"))
    marked.groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("tk")))),
            x => x("tk")),
          tokenSep).as("new_text"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
  }
}
