package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling + shard assignment — the "shuffle once,
  * write N shard files" step before training. Training order must be a
  * reproducible global permutation (ablations re-read the same order;
  * resumption depends on it), so the permutation key is the same
  * deterministic md5-keyspace draw as [[Splits]]/[[Mixing]]:
  * `md5(salt|key)` — no RNG state, identical on any engine/partitioning.
  * Position = rank in that keyspace; shard = round-robin over positions
  * (`(pos−1) mod numShards`), which balances shards to ±1 row by
  * construction, independent of key skew.
  *
  * The global rank is computed DISTRIBUTED: a naive
  * `row_number() OVER (ORDER BY shufkey)` funnels the entire corpus
  * through ONE task (Spark plans an empty-partition window as a single
  * partition — the classic global-window trap). Instead:
  * range-partition by the shuffle key, rank locally per partition, and
  * add each partition's global offset (the cumulative count of earlier
  * range partitions — an answer-sized frame joined back by partition id).
  * Cost = one range exchange + one pid-keyed exchange of the data plus a
  * broadcast of #partitions rows; every stage is parallel at any corpus
  * size. Ties (md5 collisions) are broken by the key itself, so the
  * permutation is total and deterministic.
  */
object Sharding {

  /** `df` plus `pos` (1-based global shuffle position) and `shard`
    * (0-based round-robin shard id). Deterministic in `keyCol` and `salt`.
    */
  def shuffleShards(
      df: DataFrame,
      keyCol: String,
      numShards: Int,
      salt: String = "shard"): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val sk = md5(concat(lit(s"$salt|"), col(keyCol).cast("string")))
    val ranged = df
      .withColumn("__sk", sk)
      .repartitionByRange(col("__sk"), col(keyCol))
      .withColumn("__pid", spark_partition_id())
    // local rank within the range partition (window re-hashes by __pid —
    // groups are exactly the former range partitions)
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("__sk"), col(keyCol))
    val local = ranged.withColumn("__rn", row_number().over(wLocal))
    // answer-sized per-partition counts → exclusive running offset
    val wCum = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wCum), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("pos", col("__off") + col("__rn"))
      .withColumn("shard", ((col("pos") - 1) % numShards).cast("long"))
      .drop("__sk", "__pid", "__rn", "__off")
  }
}
