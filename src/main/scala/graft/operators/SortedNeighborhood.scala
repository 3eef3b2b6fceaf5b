package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood candidate generation (Hernández–Stolfo
  * merge/purge): sort each block by a key and pair every record with its
  * next `w` neighbors in sort order — the third blocking strategy in the
  * dedup family, complementary to attribute blocking (q48/q60: exact
  * block key) and LSH banding (q24: probabilistic): a sort key clusters
  * near-misses that share NO exact attribute and may miss LSH bands
  * (numeric proximity, lexicographic typos).
  *
  * Plan shape: one rank window PARTITIONED BY BLOCK (deterministic
  * (sort, tie…) total order), then the neighborhood join as a BUCKET
  * EQUI-JOIN — the left leg emits bucket ⌊rank/w⌋ and its successor, the
  * right leg keys on its own bucket, and the residual `0 < gap ≤ w`
  * filter trims the corners. Candidates are emitted exactly once (the
  * right row's bucket is unique). Never a rank-range theta join (BNLJ at
  * scale) and never a global sort — parallelism = blocks × partitions,
  * output ≤ w·n rows by construction.
  *
  * Determinism: ranks come from a (sort, tie…) total order the caller
  * makes unique; all arithmetic is integer except the carried sort-key
  * values (reported verbatim for downstream verification — e.g. a
  * |Δvalue| ≤ ε or edit-distance gate).
  */
object SortedNeighborhood {

  /** floor(a/b) in exact integer arithmetic (q125 idiom). */
  private def floorDiv(a: org.apache.spark.sql.Column, b: Long) =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Candidate pairs within `w` sort positions inside each block.
    *
    * @return (blockCols…, id_a, id_b, <sortCol>_a, <sortCol>_b,
    *         rank_gap) with rank_a < rank_b, rank_gap = rank_b − rank_a ∈ [1, w]
    */
  def pairs(
      df: DataFrame, blockCols: Seq[String], sortCol: String,
      tieCols: Seq[String], idCol: String, w: Int): DataFrame = {
    require(blockCols.nonEmpty, "blockCols must be non-empty")
    require(w >= 1, "w must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val b = blockCols.map(col)
    val order = (col(sortCol) +: tieCols.map(col)).map(_.asc)
    val ranked = df.select(b ++ Seq(col(idCol), col(sortCol)): _*)
      .withColumn("__rnk",
        row_number().over(Window.partitionBy(b: _*).orderBy(order: _*))
          .cast("long"))
    val bucket = floorDiv(col("__rnk") - 1, w.toLong)
    val left = ranked
      .withColumn("__bk", explode(array(bucket, bucket + 1)))
      .select(b ++ Seq(col(idCol).as("id_a"), col(sortCol).as(s"${sortCol}_a"),
        col("__rnk").as("__ra"), col("__bk")): _*)
    val right = ranked
      .withColumn("__bk", bucket)
      .select(blockCols.map(c => col(c).as(s"__r_$c")) ++
        Seq(col(idCol).as("id_b"), col(sortCol).as(s"${sortCol}_b"),
          col("__rnk").as("__rb"), col("__bk")): _*)
    val joinCond = blockCols
      .map(c => col(c) === col(s"__r_$c"))
      .reduce(_ && _) && left("__bk") === right("__bk")
    left.join(right, joinCond)
      .filter(col("__rb") - col("__ra") >= 1L &&
        col("__rb") - col("__ra") <= w.toLong)
      .select(b ++ Seq(col("id_a"), col("id_b"),
        col(s"${sortCol}_a"), col(s"${sortCol}_b"),
        (col("__rb") - col("__ra")).as("rank_gap")): _*)
  }
}
