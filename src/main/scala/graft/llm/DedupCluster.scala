package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step between
  * "find near-dup PAIRS" ([[MinHashLsh.nearDupPairs]]) and "dedup the
  * CORPUS": transitive closure groups pairs into clusters, and keep-one-per-
  * cluster (the minimum id as the canonical representative) is what actually
  * shrinks the training set. Without it, A≈B and B≈C dedup to {A, C} even
  * when A≈C transitively.
  *
  * Algorithm: iterative min-label propagation. Every node starts with
  * `rep = id`; each round every node takes the min rep over itself and its
  * neighbors; converged when no rep changed. Rounds = graph diameter, and
  * near-dup clusters are small and dense (a near-dup relation is almost
  * transitive), so 2–4 rounds is typical at any corpus size. Each round is
  * one equi-join + one key agg — the standard shuffle shapes, no driver-side
  * graph state; the edge list is persisted once and each round's labels are
  * `localCheckpoint`ed so lineage stays O(1) instead of O(rounds).
  *
  * For adversarial long-chain graphs (diameter ≫ log n — not a shape
  * near-dup graphs take), the classic fix is pointer-doubling (large-star /
  * small-star); `maxIters` bounds the work and fails loudly rather than
  * silently emitting partial clusters.
  */
object DedupCluster {

  /** Free the block-manager storage behind a `localCheckpoint`ed frame.
    * Local checkpoints live as persisted RDD blocks outside the SQL
    * CacheManager (`df.unpersist()` is a no-op on them) and are otherwise
    * only reclaimed when the RDD is GC'd — explicit release keeps storage
    * flat across propagation rounds instead of growing linearly with them.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Component representative (min reachable id) for every node appearing
    * in `pairs`. Output: (`id`, `rep`) — one row per distinct node;
    * singleton documents (no pair) are their own representative by
    * definition and are simply absent here.
    */
  def components(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIters: Int = 25): DataFrame = {
    // undirected edge list, both directions, deduped once
    val edges = pairs.select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .union(pairs.select(col(bCol).cast("long").as("x"), col(aCol).cast("long").as("y")))
      .distinct()
      .persist()
    // Round 1 folded into initialization: from rep = id, the first
    // propagation round would compute exactly least(id, min(neighbor id)) —
    // one aggregation over the edge list, no join. (Every node appears as
    // an `x` because edges carry both directions.)
    var labels = edges.groupBy(col("x").as("id"))
      .agg(min(col("y")).as("__my"))
      .select(col("id"), least(col("id"), col("__my")).as("rep"))
      .localCheckpoint()
    var iters = 1
    var done = false
    while (!done) {
      if (iters >= maxIters)
        throw new IllegalStateException(
          s"DedupCluster.components did not converge in $maxIters rounds — " +
            "graph diameter exceeds the near-dup regime; raise maxIters or " +
            "switch to a pointer-doubling variant")
      // One join + one aggregate per round: neighbors' reps are propagated
      // across edges, the node's own row rides along through a union (its
      // prior rep doubling as the `__old` marker — exactly one non-null per
      // id), and a single min-agg combines both. The prior rep lands in the
      // checkpointed output so convergence is a cheap scan of the
      // checkpointed blocks, not a second join.
      val prop = edges
        .join(labels.withColumnRenamed("id", "y"), "y")
        .select(col("x").as("id"), col("rep"), lit(null).cast("long").as("__old"))
      val next = labels.select(col("id"), col("rep"), col("rep").as("__old"))
        .unionByName(prop)
        .groupBy(col("id"))
        .agg(min(col("rep")).as("rep"), min(col("__old")).as("__old"))
        .localCheckpoint()
      val changed = next.filter(col("rep") < col("__old")).limit(1).count()
      // prior round's labels are dead once `next` is checkpointed and the
      // changed-count (the only reader of both) has run — release its blocks
      freeCheckpoint(labels)
      labels = next.select("id", "rep")
      iters += 1
      done = changed == 0L
    }
    edges.unpersist()
    labels
  }

  /** Per-cluster summary: representative (min id), member count, and the
    * sorted comma-joined member list (canonical string form so the result
    * is engine-comparable). Only multi-member clusters appear — singletons
    * never entered the pair list.
    */
  def clusterSummary(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    components(pairs, aCol, bCol)
      .groupBy(col("rep"))
      .agg(
        count(lit(1)).as("n_members"),
        array_join(array_sort(collect_set(col("id"))), ",").as("members"))
}
