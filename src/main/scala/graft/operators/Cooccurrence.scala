package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: which items appear TOGETHER in the
  * same basket more often than chance — support / confidence / lift over
  * item pairs, the association-rule primitives (Agrawal & Srikant 1994)
  * behind "frequently bought together", co-viewed-documents, and
  * co-occurring-tag analyses.
  *
  *   support(a,b) = |baskets ⊇ {a,b}| / N
  *   confidence(a→b) = |{a,b}| / |{a}|
  *   lift(a,b) = N·|{a,b}| / (|{a}|·|{b}|)   (1 = independent, >1 = affinity)
  *
  * Plan shape (scale story): pair generation is a SELF-EQUI-JOIN ON THE
  * BASKET KEY — cost Σ k_b² over per-basket sizes k_b, never |items|²
  * (the basket key is the blocking key; the q48/q60 blocked-join idiom).
  * The skew risk is a single giant basket (k² blowup), so `maxBasketSize`
  * drops oversized baskets loudly-by-default-documented — at corpus scale
  * a 10⁵-item basket is a data bug, not signal (and the cap is the
  * standard Apriori practice). Counts are map-side-combined aggregates;
  * statistics are exact-integer-count divisions (IEEE, engine-identical).
  */
object Cooccurrence {

  /** Distinct-item pair counts with association statistics: one row per
    * unordered pair (a < b) — (`a`, `b`, `n_ab`, `n_a`, `n_b`, `support`,
    * `conf_a_b`, `lift`). `n_a`/`n_b` are basket counts of each item
    * alone; N is the total distinct-basket count.
    */
  def pairStats(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Int = 1000): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val items = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .filter(col("__it").isNotNull)
      .distinct()
    val sized = items
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__bk"))))
      .filter(col("__bsz") <= maxBasketSize)
      .drop("__bsz")
    // N as a broadcast 1-row frame (the q59 idiom) — the whole operator
    // stays one lazy plan, no eager action at construction
    val nFrame = sized.select(col("__bk")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemCounts = sized.groupBy(col("__it")).agg(count(lit(1)).as("__ni"))
    val pairs = sized.as("l")
      .join(sized.as("r"), col("l.__bk") === col("r.__bk") &&
        col("l.__it") < col("r.__it"))
      .groupBy(col("l.__it").as("a"), col("r.__it").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(itemCounts.withColumnRenamed("__it", "a").withColumnRenamed("__ni", "n_a"), "a")
      .join(itemCounts.withColumnRenamed("__it", "b").withColumnRenamed("__ni", "n_b"), "b")
      .crossJoin(broadcast(nFrame))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("__n")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("conf_a_b"),
        (col("n_ab").cast("double") * col("__n") / (col("n_a") * col("n_b"))).as("lift"))
  }
}
