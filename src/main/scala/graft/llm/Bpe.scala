package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge rounds — the tokenizer-training core of an LLM
  * data pipeline (reference corpus: the `documents` table's `text`), kept
  * ENTIRELY in-plan: no round ever collects to the driver.
  *
  * The classical algorithm (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") alternates
  *   1. count adjacent symbol pairs across the corpus,
  *   2. merge the most frequent pair everywhere,
  * and its distributed shape here is:
  *   1. PAIR COUNT: one explode over the VOCABULARY frame (distinct words
  *      weighted by corpus count — the corpus itself is scanned once, ever)
  *      into a (pair → Σcnt) hash aggregate with map-side combine;
  *   2. TOP-1: a TakeOrdered of that answer-sized frame — a 1-row
  *      DataFrame, NOT a collect;
  *   3. MERGE: broadcast-crossJoin the 1-row winner into the vocabulary and
  *      re-fold each word's symbols under the new merge rule.
  * Rounds chain lazily; executing the returned merge table runs the whole
  * cascade as one Spark job graph. At 100 TB the vocabulary frame is
  * millions of rows (Heaps' law), the pair frame smaller still — every
  * per-round stage is answer-sized relative to the corpus.
  *
  * Greedy merge semantics: BPE applies a merge left-to-right,
  * non-overlapping, and a freshly merged symbol immediately becomes the
  * left neighbour of the next comparison (so pair (x,x) on `x x x x x`
  * yields `xx xx x`, not `xx x xx`). A string `replace` does NOT implement
  * this (it skips the shared delimiter of back-to-back matches); the
  * correct fold is a left reduce over the symbol list whose accumulator is
  * the space-joined merged prefix:
  *   step(acc, s) = if (lastSym(acc), s) == pair
  *                  then acc[..-lastSym] ++ merged else acc + " " + s
  * which is `aggregate(syms, …)` here and `list_reduce` in the DuckDB twin
  * — identical scalar string ops, engine-neutral by construction. Symbols
  * never contain spaces (words come from a space-split), so the space-join
  * round-trip is lossless.
  *
  * Determinism: counts are exact longs; the winning pair breaks count ties
  * lexically; merges change counts deterministically round over round.
  */
object Bpe {

  /** Vocabulary frame of `corpus.textCol`: one row per distinct non-empty
    * word — `word`, its corpus count `cnt`, and `syms`, the word's initial
    * symbol list (one character per symbol; no end-of-word marker in this
    * variant). The only corpus-sized stage in the whole trainer.
    */
  def wordSymbols(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(1, char_length(word)), i -> substr(word, i, 1))"))

  /** Corpus-weighted adjacent-pair counts of a vocabulary frame: `pair`
    * (the two symbols space-joined) → `c` (Σ word counts). One explode +
    * one hash aggregate; rows ∝ distinct pairs (≤ vocab size × avg word
    * length, but heavily collapsed by the group).
    */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) > 1)
      .select(
        explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))")).as("pair"),
        col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("c"))

  /** The round's winning pair as a 1-ROW FRAME (count desc, pair asc):
    * TakeOrdered over the answer-sized pair frame — stays in-plan so the
    * caller can broadcast it instead of collecting.
    */
  def topPair(pc: DataFrame): DataFrame =
    pc.orderBy(col("c").desc, col("pair")).limit(1)

  /** Re-fold every word's symbols under the winning merge (see the greedy
    * semantics note above). `top` is broadcast; the fold is a codegen'd
    * `aggregate` HOF over each word's symbol list.
    *
    * EXHAUSTION SAFETY: when `top` is EMPTY (every word already fused to a
    * single symbol, or a degenerate corpus), this is a NO-OP, not data
    * loss. `top` is first collapsed to a GUARANTEED-1-ROW frame with a
    * `max` aggregate (an aggregate over zero rows yields one NULL row), so
    * the crossJoin never empties the vocabulary; with `__pair` NULL the
    * fold's CASE comparison is never true and each word's symbols rebuild
    * unchanged. The 1-row aggregate keeps the join an INNER broadcast
    * crossJoin — whole-stage-codegen'd, unlike the left-outer BNLJ form
    * (which measurably serialized the per-round fold).
    */
  def applyMerge(words: DataFrame, top: DataFrame): DataFrame =
    words.crossJoin(broadcast(top.agg(max(col("pair")).as("__pair"))))
      .withColumn("__folded", expr(
        """aggregate(
          |  slice(syms, 2, greatest(size(syms) - 1, 0)),
          |  element_at(syms, 1),
          |  (acc, x) -> CASE
          |    WHEN concat(substring_index(acc, ' ', -1), ' ', x) = __pair
          |    THEN concat(
          |      substr(acc, 1, char_length(acc) - char_length(substring_index(acc, ' ', -1))),
          |      replace(__pair, ' ', ''))
          |    ELSE concat(acc, ' ', x) END)""".stripMargin))
      .select(col("word"), col("cnt"), split(col("__folded"), " ").as("syms"))

  /** Train `rounds` BPE merges over `corpus.textCol`; returns the merge
    * table — one row per round: `merge_ix` (1-based), `pair`, `merged`
    * (the new symbol), `c` (the pair's corpus count when chosen). Lazy:
    * the full cascade executes when the result does.
    *
    * EXHAUSTION: if the vocabulary runs out of adjacent pairs before
    * `rounds` (every word a single symbol), the exhausted rounds contribute
    * ZERO rows — the result has merge_ix 1..r_exhausted and fewer than
    * `rounds` rows, which is the caller-visible signal (count the rows to
    * detect it). Post-exhaustion [[applyMerge]] rounds are no-ops, so
    * [[encodeWords]] with excess rounds returns the fully-merged vocabulary
    * rather than an empty frame.
    */
  def merges(corpus: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "BPE needs at least one merge round")
    var words = wordSymbols(corpus, textCol)
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val top = topPair(pairCounts(words))
      val row = top.select(
        lit(r).as("merge_ix"), col("pair"),
        expr("replace(pair, ' ', '')").as("merged"), col("c"))
      out = Some(out.fold(row)(_.unionAll(row)))
      if (r < rounds) words = applyMerge(words, top)
    }
    out.get
  }

  /** ENCODE: train `rounds` merges and apply ALL of them to the vocabulary
    * — the tokenizer-application half of BPE. Returns the encoded
    * vocabulary frame (`word`, `cnt`, `syms` after every merge); encoding a
    * corpus is then a word equi-join against this frame (words repeat —
    * Zipf — so per-word work is paid once, not per occurrence). Still
    * fully in-plan: the cascade chains lazily like [[merges]].
    */
  def encodeWords(corpus: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "BPE needs at least one merge round")
    var words = wordSymbols(corpus, textCol)
    for (_ <- 1 to rounds)
      words = applyMerge(words, topPair(pairCounts(words)))
    words
  }
}
