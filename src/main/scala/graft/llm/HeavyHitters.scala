package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.FrequentItems

/** EXACT corpus-wide top-k frequent tokens in bounded memory — the
  * "what are the k most common tokens in 100 TB of text" primitive of
  * vocabulary building and stopword mining.
  *
  * A naive `groupBy(token).count.orderBy.limit(k)` is already
  * shuffle-correct, but its aggregation state is O(distinct tokens) — fine
  * at 10⁷ vocabulary, hostile at web-corpus 10¹⁰ (raw byte-soup tokens,
  * OCR noise, URLs). This operator is the classic two-pass exact scheme:
  *
  *  1. **Sketch pass**: one Misra–Gries aggregate
  *     ([[graft.functions.MisraGriesAgg]], O(capacity) memory per buffer,
  *     map-side merged) yields a candidate set that PROVABLY contains every
  *     token with `count > err`, where `err = (N - Σ lb) / (capacity+1)` is
  *     the sketch's own count-deficit bound (N = total tokens, Σ lb = sum
  *     of retained lower bounds; each decrement/merge-pivot step destroys
  *     ≥ capacity+1 count units, so any absent token's true count ≤ err).
  *  2. **Recount pass**: exact counts for candidates only — scan-side
  *     membership filter (literal IN for small candidate sets, broadcast
  *     semi-join above [[HeavyHitters.InListMax]]), map-side-combined
  *     groupBy whose state is now `capacity`-bounded.
  *
  * The result is then CERTIFIED exact: the k-th exact count must exceed
  * `err` (so no non-candidate could displace it), or — when fewer than k
  * candidates exist — `err` must be 0 (sketch never overflowed ⇒ it holds
  * the complete vocabulary). Certification failure throws with the
  * capacity to raise, rather than silently returning approximate counts.
  *
  * Partition-invariance: the candidate SET varies with partitioning (MG
  * state is order-dependent) but any certified run's top-k is the same —
  * candidates is a superset of the true top-k in every run and the
  * recount is exact, so the (count desc, token asc) order is unique.
  *
  * Output: (`token` string, `n` long), ordered (n desc, token asc), ≤ k
  * rows — answer-sized.
  */
object HeavyHitters {

  /** Above this many candidates, membership switches from a literal IN
    * list to a broadcast semi-join (a 10⁶-entry In expression bloats the
    * plan and falls out of codegen).
    */
  val InListMax = 1000

  def topKTokens(
      docs: DataFrame,
      textCol: Column,
      k: Int,
      capacity: Int,
      tokenSep: String = " ",
      inListMax: Int = InListMax): DataFrame = {
    require(k >= 1, s"topKTokens needs k >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._

    val tokens = docs.select(explode(split(textCol, tokenSep)).as("token"))

    // pass 1: candidate sketch + total token count, one job
    val p1 = tokens
      .agg(FrequentItems.mgSketch(col("token"), capacity).as("sk"),
        count(lit(1)).as("total"))
      .head()
    val sketch = p1.getSeq[Row](0)
    val total = p1.getLong(1)
    val sumLb = sketch.map(_.getLong(1)).sum
    val err = (total - sumLb) / (capacity + 1L) // any absent token's count <= err
    val candidates = sketch.map(_.getString(0))

    // pass 2: exact recount restricted to candidates
    val counted =
      (if (candidates.size <= inListMax)
        tokens.filter(col("token").isin(candidates: _*))
      else
        tokens.join(
          broadcast(candidates.toDF("token")), Seq("token"), "left_semi"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(k)

    // certification: the result below is exact, or we refuse
    val top = counted.collect()
    if (top.length == k) {
      val kth = top.last.getLong(1)
      require(kth > err,
        s"topKTokens cannot certify exactness: k-th count $kth <= sketch " +
          s"error bound $err (N=$total, capacity=$capacity) — a non-candidate " +
          "token could belong in the top-k; raise capacity")
    } else {
      require(err == 0L,
        s"topKTokens found only ${top.length} < k=$k candidates with " +
          s"non-zero error bound $err — unseen tokens could fill the " +
          "remaining ranks; raise capacity")
    }
    // Return the rows that were CERTIFIED, not the lazy plan: re-executing
    // `counted` would re-pay the recount shuffle on every consumption and —
    // against a mutated or non-deterministic source — could return rows the
    // certificate above never saw. The result is answer-sized (<= k), so a
    // local relation is the right physical form.
    spark.createDataFrame(
      java.util.Arrays.asList(top: _*), counted.schema)
  }
}
