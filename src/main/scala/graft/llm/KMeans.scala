package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spherical k-means (Lloyd's algorithm) over an embedding
  * column — the LEARNED coarse quantizer complementing the label-derived
  * one in [[Embeddings.centroids]] (reference corpus layout:
  * embeddings.parquet, 64-dim float vectors; same table q40–q42 index).
  *
  * Shape per iteration — the plan Spark MLlib's KMeans uses, re-derived
  * on the DataFrame API:
  *   1. ASSIGN: scan-time argmax of cosine similarity against the k
  *      centroids inlined as literals ([[Embeddings.ivfAssign]]) — no
  *      join, no shuffle, O(k·dim) per row inside whole-stage codegen.
  *   2. UPDATE: elementwise mean per cell — one (cell, dim)-keyed shuffle
  *      with map-side combine (k·dim groups, answer-sized).
  *   3. COLLECT: the new centroid frame is materialized to the driver as a
  *      k×dim [[Embeddings.Quantizer]] — the model-artifact pattern
  *      (driver-sized by definition; ~65k cells × 64 dims ≈ 4M doubles
  *      is still trivially driver-sized at 100 TB corpus scale).
  * Iterations are a driver-side loop over answer-sized artifacts, like
  * [[DedupCluster]]'s rounds — the corpus itself never leaves executors.
  *
  * Cosine assignment is scale-invariant in the centroid, so the UNNORMALIZED
  * elementwise mean yields exactly the assignments of the normalized-mean
  * formulation — this is genuine spherical k-means, one rescale cheaper.
  *
  * Determinism (the cross-engine oracle story):
  *  - Seeding: the k corpus vectors with the smallest md5("km|" + vec_id)
  *    get cells 0..k-1 in key order — engine-neutral, scattered, and free
  *    of RNG state (the md5-keyspace idiom used across Splits/Sharding).
  *  - Ties: argmax breaks toward the lowest cell id (same struct-ordering
  *    convention as q41's IVF assignment).
  *  - A cell that captures no points simply drops out of the next round's
  *    quantizer (standard Lloyd degeneracy handling; both engines drop it
  *    identically because assignments match).
  * Residual cross-engine risk is the shared q40/q41 exposure: centroid
  * components are double means whose partial-sum order differs between
  * engines; an assignment flips only if two cells tie within an ulp.
  */
object KMeans {

  /** Deterministic seed quantizer: k vectors with the smallest salted md5
    * of their id, cells numbered in key order. One k-row TakeOrdered —
    * driver-sized by definition.
    */
  def seedQuantizer(corpus: DataFrame, k: Int, salt: String = "km"): Embeddings.Quantizer = {
    require(k > 0, "k-means needs k > 0")
    corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      .orderBy(md5(concat_ws("|", lit(salt), col("vec_id").cast("string"))), col("vec_id"))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i: Any, r.getSeq[Double](r.fieldIndex("vec"))) }
      .toIndexedSeq
  }

  /** Per-cell elementwise mean of assigned vectors — [[Embeddings.centroids]]
    * keyed by the learned cell instead of the data label. Empty cells are
    * absent (no rows → no group).
    */
  def updateCentroids(assigned: DataFrame): DataFrame =
    Embeddings.centroids(
      assigned.select(col("cell").as("label"), col("vec").as("embedding")))

  /** Run `iters` Lloyd rounds from the md5 seeds; returns the final
    * quantizer. Each round is one assignment scan + one (cell, dim) shuffle
    * + one k×dim collect.
    */
  def fit(corpus: DataFrame, k: Int, iters: Int, salt: String = "km"): Embeddings.Quantizer = {
    require(iters >= 0, "iters must be >= 0")
    var quant = seedQuantizer(corpus, k, salt)
    for (_ <- 1 to iters)
      quant = Embeddings.trainQuantizer(updateCentroids(Embeddings.ivfAssign(corpus, quant)))
    quant
  }

  /** Final assignment WITH the winning similarity: [[Embeddings.ivfAssign]]'s
    * argmin over (-sim, cell) structs, keeping the similarity instead of
    * discarding it. Double negation is exact, so `sim` is bit-identical to
    * the cosine the argmax compared.
    */
  def assignScored(corpus: DataFrame, quant: Embeddings.Quantizer): DataFrame = {
    val v = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val candidates = quant.map { case (label, c) =>
      struct((-Embeddings.cosine(col("vec"), typedLit(c))).as("ns"), lit(label).as("label"))
    }
    v.withColumn("__best", array_min(array(candidates: _*)))
      .select(col("vec_id"), col("vec"),
        col("__best.label").as("cell"), (-col("__best.ns")).as("sim"))
  }
}
