package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature hashing ("the hashing trick", Weinberger et al. 2009): map each
  * token to one of `numBuckets` feature slots by hash, with a hash-derived
  * ±1 sign so colliding tokens cancel in expectation rather than
  * accumulate — the vocabulary-free vectorizer. Unlike a dictionary
  * encoding ([[Vocab]]), there is NO fitted state: the feature space is
  * fixed a priori, so streaming data, new shards, and new corpora all map
  * consistently with zero coordination — the property that matters when a
  * 1000-executor job cannot rendezvous on a shared vocabulary build.
  *
  * Hash and sign come from the engine's standard md5-keyspace draw
  * (bucket = first 8 hex digits mod `numBuckets`; sign = parity of the
  * 9th hex digit — an independent bit of the same digest), so vectors are
  * bit-identical in any engine with zero RNG state (the [[Splits]]
  * convention).
  *
  * Plan shape (scale story): one explode + one (id, bucket) hash
  * aggregate. Map-side partial aggregation caps each document's
  * contribution at `numBuckets` rows, so shuffle volume is
  * `O(docs × min(tokens_per_doc, numBuckets))` — bounded by the OUTPUT
  * size, not the token count — and the result is already the sparse
  * matrix layout (id, slot, value) that training shards consume. No
  * vocabulary join, no broadcast, no fitted artifact.
  */
object FeatureHash {

  private def digest(tok: Column, salt: String): Column =
    md5(concat(lit(s"$salt|"), tok.cast("string")))

  /** Slot index of one token: first 8 md5 hex digits mod `numBuckets`. */
  def bucketOf(tok: Column, numBuckets: Int, salt: String = "fh"): Column =
    conv(substring(digest(tok, salt), 1, 8), 16, 10).cast("long") % numBuckets

  /** ±1 sign of one token: parity of the digest's 9th hex digit. */
  def signOf(tok: Column, salt: String = "fh"): Column =
    lit(1) - lit(2) * (conv(substring(digest(tok, salt), 9, 1), 16, 10)
      .cast("int") % 2)

  /** SQL twins for cross-engine oracles (DuckDB dialect). */
  def bucketSql(tokExprSql: String, numBuckets: Int, salt: String = "fh"): String =
    s"CAST(('0x' || substr(md5('$salt|' || $tokExprSql), 1, 8)) AS BIGINT) % $numBuckets"
  def signSql(tokExprSql: String, salt: String = "fh"): String =
    s"1 - 2 * (CAST(('0x' || substr(md5('$salt|' || $tokExprSql), 9, 1)) AS INT) % 2)"

  /** Sparse hashed-feature matrix of a tokenized corpus: one row per
    * non-zero cell — (`idCol`, `bucket` ∈ [0, numBuckets), `value` =
    * signed collision-cancelling count). Zero-sum cells (collisions that
    * exactly cancel) are dropped — they are zeros of the sparse matrix.
    * `tokensCol` is an array column (pre-tokenized upstream).
    */
  def vectorize(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      numBuckets: Int,
      salt: String = "fh"): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.select(col(idCol), explode(col(tokensCol)).as("__tok"))
      .groupBy(col(idCol),
        bucketOf(col("__tok"), numBuckets, salt).as("bucket"))
      .agg(sum(signOf(col("__tok"), salt).cast("long")).as("value"))
      .filter(col("value") =!= 0)
  }
}
