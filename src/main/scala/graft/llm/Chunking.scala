package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-token-window document chunking with stride (overlap) — the
  * training/RAG preprocessing step that turns a variable-length corpus into
  * model-sized sequences.
  *
  * Chunk layout for a document of `n` tokens, window `size`, stride
  * `stride` (< size ⇒ overlap of `size - stride` tokens):
  * chunk i covers tokens `[i·stride, min(i·stride + size, n))` (0-based),
  * and the number of chunks is `1` when `n ≤ size`, else
  * `ceil((n − size) / stride) + 1` — the last chunk is the first one whose
  * window reaches the end of the document, so every token is covered and no
  * fully-duplicate trailing chunk is emitted.
  *
  * Scale shape: pure per-row array expressions (`split` → `sequence` →
  * `explode` → `slice`) — no shuffle, no UDF, runs inside whole-stage
  * codegen at scan speed. Output size is input size × (1/stride) tokens,
  * the same data-parallel growth as the downstream tokenizer expects; the
  * explode is pipelined, never materialized per-document.
  */
object Chunking {

  /** Output columns added by [[chunkByTokens]]; also claimed transiently:
    * `__toks`, `__chunk`. Inputs carrying any of these names are rejected
    * rather than silently clobbered.
    */
  val reservedColumns: Seq[String] =
    Seq("chunk_ix", "chunk_text", "chunk_tokens", "__toks", "__chunk")

  /** Explode `textCol` into overlapping token-window chunks.
    *
    * Output: all columns of `df` plus `chunk_ix` (0-based, long),
    * `chunk_text` (space-joined tokens) and `chunk_tokens` (long).
    *
    * Rows whose `textCol` is NULL are DROPPED (deliberate: a NULL document
    * has no tokens to chunk, and `explode` over a NULL chunk count emits no
    * rows — the same convention as a tokenizer skipping unreadable docs).
    * Callers that need NULL docs preserved should `coalesce` the column to
    * `''` upstream, which yields one empty chunk instead.
    */
  def chunkByTokens(
      df: DataFrame,
      textCol: String,
      size: Int,
      stride: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in (0, size=$size], got $stride")
    val clash = df.columns.toSeq.intersect(reservedColumns)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Chunking's " +
        s"reserved output columns (${reservedColumns.mkString(", ")}) — " +
        "rename them before chunking")
    val toks = split(col(textCol), " ")
    val n = org.apache.spark.sql.functions.size(toks)
    // number of chunks; guard the n>size branch so `sequence` never sees a
    // descending range (Spark's sequence(1,0) counts DOWN, unlike SQL
    // generate_series which is empty)
    val nchunks = when(n <= size, lit(1))
      .otherwise(ceil((n - size).cast("double") / stride).cast("int") + 1)
    df.withColumn("__toks", toks)
      .withColumn("chunk_ix", explode(sequence(lit(0L), (nchunks - 1).cast("long"))))
      .withColumn("__chunk", slice(col("__toks"), (col("chunk_ix") * stride + 1).cast("int"), lit(size)))
      .withColumn("chunk_text", array_join(col("__chunk"), " "))
      .withColumn("chunk_tokens", org.apache.spark.sql.functions.size(col("__chunk")).cast("long"))
      .drop("__toks", "__chunk")
  }
}
