package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion: combine a lexical ranking (BM25, [[Bm25]])
  * with a dense ranking (embedding cosine, [[Embeddings]]) by Reciprocal
  * Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  *
  *   rrf(d) = Σ_lists 1/(k + rank_list(d)),   absent-from-list ⇒ 0
  *
  * — the standard "hybrid search" scorer of a RAG serving stack, and the
  * robust default precisely because it consumes RANKS, not scores: no
  * cross-retriever score calibration is needed.
  *
  * Scale shape: RRF is defined on TRUNCATED rank lists (depth ≤ a few
  * hundred per retriever), so each input arrives as a TakeOrderedAndProject
  * result — answer-sized by construction — and everything here (one
  * full-outer join on the doc id + one top-k) touches only those lists.
  * The corpus-sized work lives inside the retrievers, where the scale
  * stories already exist (q95's filtered explode, q26's broadcast query
  * set / q41's IVF cells). The one rule at 100 TB: never feed an
  * untruncated corpus-sized ranking in — rank assignment itself would
  * need a global window; truncate at the retriever with its top-k.
  *
  * Determinism: 1/(k+rank) is one IEEE division per list and one fixed-
  * order add — no libm; `fused8` floors the sum at scale 8 into a long,
  * the exact cross-engine sort key (ties broken on the doc id).
  */
object HybridRetrieval {

  /** Fuse two truncated rank lists. Returns top-`topK` rows:
    * `rnk`, `id`, `ra`, `rb` (per-list ranks, NULL where absent),
    * `fused8` (scale-8 exact RRF score).
    *
    * Input contract, ENFORCED in-plan: ranks are 1-based positive ints —
    * a rank < 1 raises at execution (a rank of exactly −k would divide by
    * zero; negatives would invert the ordering). Duplicate ids within one
    * list are collapsed to their BEST (minimum) rank before the join —
    * without that, a duplicate would fan out through the full-outer join
    * into duplicate fused rows. Both guards run on the answer-sized
    * truncated lists, so their cost is two tiny hash aggregates.
    */
  def rrfFuse(
      a: DataFrame, aId: String, aRank: String,
      b: DataFrame, bId: String, bRank: String,
      k: Int = 60, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "rrf k must be >= 1")
    def ranked(df: DataFrame, id: String, rank: String, out: String) =
      df.select(col(id).as("id"),
          // loud 1-based-positive-rank guard: when() keeps the value on the
          // valid path, raise_error fires per offending row at execution
          when(col(rank).cast("int") >= 1, col(rank).cast("int"))
            .otherwise(raise_error(concat(
              lit(s"rrfFuse: rank '$rank' must be a positive 1-based int, got "),
              col(rank).cast("string"), lit(" for id "), col(id).cast("string"))))
            .as(out))
        .groupBy(col("id")).agg(min(col(out)).as(out)) // best rank per id
    val fa = ranked(a, aId, aRank, "ra")
    val fb = ranked(b, bId, bRank, "rb")
    val fused = fa.join(fb, Seq("id"), "full_outer")
      .withColumn("fused8", floor(
        (coalesce(lit(1.0) / (lit(k) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("rb")), lit(0.0))) * lit(1e8) + 0.5)
        .cast("long"))
    val top = fused.orderBy(col("fused8").desc, col("id")).limit(topK)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("fused8").desc, col("id"))))
      .select(col("rnk"), col("id"), col("ra"), col("rb"), col("fused8"))
  }
}
