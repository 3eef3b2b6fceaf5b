package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank-style link centrality, fully in-plan — the quality-weighting
  * signal a web-crawl curation pipeline computes over its link graph
  * (PageRank-weighted sampling is the canonical "which pages are worth
  * keeping" prior; the same rounds serve citation graphs and near-dup
  * cluster graphs).
  *
  * r_{k+1}(v) = (1−d)/n + d · Σ_{u→v} r_k(u)/outdeg(u), r_0 = 1/n.
  *
  * Scale shape (the q61/q84 iterative idiom): outdegree is ONE hash
  * aggregate, attached to the edge frame once (`se`) and reused by every
  * round; each round is then exactly one node-keyed equi-join (ranks ×
  * edges on src) plus one hash aggregate by dst — no driver-side graph
  * state, no collect; `n` is a 1-row broadcast. Rank frames are |V|-sized,
  * edge frames |E|-sized; both stay distributed. For rounds ≫ a handful,
  * localCheckpoint the rank frame on a cadence (the q61 lineage
  * discipline) — at the 2–3 rounds a curation prior needs, plain lineage
  * is cheaper.
  *
  * Dangling nodes are OUT OF SCOPE by contract: every node must appear as
  * an edge source (symmetrize an undirected graph first, or add
  * self-loops), otherwise their rank mass silently drains each round —
  * `pageRank` fails loudly if any destination never appears as a source.
  *
  * Determinism: per-edge contributions floor at scale 12 into longs
  * before the per-node sum (exact integer addition on any merge tree /
  * partitioning); everything else is fixed-order correctly-rounded IEEE
  * arithmetic (division, one multiply-add per node) — no libm at all, so
  * ranks are bit-identical cross-engine with no ±ulp caveat.
  */
object GraphRank {

  /** Ranks after `rounds` power-iteration rounds over directed `edges`.
    *
    * @param edges one row per directed edge; duplicates count as parallel
    *              edges (they add outdegree and contribute twice — dedupe
    *              first if that is not intended)
    * @return one row per node: `node`, `pr` (double), `pr12` (the exact
    *         scale-12 long the next round would consume — the
    *         deterministic sort/compare key)
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, damping: Double = 0.85): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val src = col(srcCol)
    val dst = col(dstCol)
    val od = edges.groupBy(src.as("node")).agg(count(lit(1)).as("deg"))
    // loud dangling-node check: a dst that is never a src loses mass
    val dangling = edges.select(dst.as("node")).distinct()
      .join(od, Seq("node"), "left_anti").limit(1).collect()
    require(dangling.isEmpty,
      s"dangling node '${dangling.headOption.map(_.get(0)).orNull}': every " +
        "destination must also appear as an edge source (symmetrize first)")
    val n = od.agg(count(lit(1)).as("n"))
    // outdegree attached once, reused by every round
    val se = edges.join(od.withColumnRenamed("node", "__src"),
        src === col("__src"))
      .select(src.as("__s"), dst.as("__d"), col("deg"))
    val oneMinusD = 1.0 - damping // IEEE once, embedded as a literal

    var r: DataFrame = od.select(col("node")).crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("n")).as("pr"))
    for (_ <- 1 to rounds) {
      r = se.join(r.withColumnRenamed("node", "__r"), col("__s") === col("__r"))
        .groupBy(col("__d").as("node"))
        .agg(sum(floor((col("pr") / col("deg")) * lit(1e12) + 0.5)
          .cast("long")).as("__psum"))
        .crossJoin(broadcast(n))
        .select(col("node"),
          (lit(oneMinusD) / col("n") +
            lit(damping) * (col("__psum").cast("double") / lit(1e12))).as("pr"))
    }
    r.withColumn("pr12", floor(col("pr") * lit(1e12) + 0.5).cast("long"))
  }

  /** Top-`k` nodes by rank: `rnk`, `node`, `pr12` — TakeOrderedAndProject
    * on the exact scale-12 key, ties broken on node id.
    */
  def topK(ranks: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = ranks.orderBy(col("pr12").desc, col("node")).limit(k)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("pr12").desc, col("node"))))
      .select(col("rnk"), col("node"), col("pr12"))
  }
}
