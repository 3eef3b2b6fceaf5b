package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005): a `depth × width`
  * counter grid where row r counts items at bucket `h_r(item)`; an item's
  * frequency estimate is the MIN over its `depth` counters — always an
  * OVERestimate (collisions only add), within `ε·N` of truth with
  * probability `1−δ` for `width = ⌈e/ε⌉`, `depth = ⌈ln 1/δ⌉`.
  *
  * Why a sketch when exact counts are one groupBy away: the exact
  * token-frequency table of a 100 TB corpus is itself terabytes (token
  * TYPES grow with corpus size), while the sketch is a CONSTANT
  * `depth × width` longs (a few KB) no matter the input — the
  * frequency-oracle you can afford to broadcast to every executor, feed a
  * streaming job, or keep per-shard and merge (the grid is trivially
  * mergeable: cell-wise sum — exactly how the distributed build below
  * already works, map-side partial aggregation being the per-partition
  * sketch merge).
  *
  * Hashes are the engine's standard md5-keyspace draw (`md5("salt|row|item")`
  * first 8 hex digits read as an integer, mod width) — pure integer
  * arithmetic, bit-identical in any engine, zero RNG state (same
  * convention as [[Splits]]).
  *
  * Plan shape (scale story): build = one explode of `depth` (row, bucket)
  * pairs per item occurrence + one hash aggregate. Map-side partial
  * aggregation bounds every partition's output at `depth × width` rows
  * regardless of input size, so the shuffle is executor-count-bounded, not
  * data-bounded, and the final sketch ≤ `depth × width` rows. Probing
  * broadcasts the (answer-sized) sketch against the probe set's derived
  * (row, bucket) pairs — an equi-join, never a scan of raw data.
  */
object CountMin {

  private def bucketOf(item: Column, row: Int, width: Int, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt|$row|"), item.cast("string"))), 1, 8),
      16, 10).cast("long") % width

  /** SQL twin of [[bucketOf]] for cross-engine oracles (DuckDB dialect). */
  def bucketSql(itemExprSql: String, row: Int, width: Int, salt: String): String =
    s"CAST(('0x' || substr(md5('$salt|$row|' || $itemExprSql), 1, 8)) AS BIGINT) % $width"

  /** Build the sketch over `itemCol` occurrences: one row per non-empty
    * cell — (`row` ∈ [0, depth), `bucket` ∈ [0, width), `cnt`). Cells never
    * hit stay absent (= 0); union-then-sum merges sketches of corpus parts.
    */
  def sketch(
      df: DataFrame,
      itemCol: String,
      depth: Int = 4,
      width: Int = 1024,
      salt: String = "cm"): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth x $width")
    df.select(explode(cellPairs(col(itemCol), depth, width, salt)).as("p"))
      .groupBy(col("p.row").as("row"), col("p.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The `depth` (row, bucket) grid cells of one item, as an inline array
    * (explode of an inline array stays in whole-stage codegen). */
  private def cellPairs(item: Column, depth: Int, width: Int, salt: String): Column =
    array((0 until depth).map(r =>
      struct(lit(r).as("row"), bucketOf(item, r, width, salt).as("bucket"))): _*)

  /** Point-query the sketch for each distinct item in `probes(itemCol)`:
    * (`itemCol`, `est`) where `est = min_r grid[r][h_r(item)]` (0 if an
    * item's cell was never touched). The sketch frame is answer-sized, so
    * the join broadcasts; `probes` should be the distinct probe set.
    */
  def estimate(
      sketchDf: DataFrame,
      probes: DataFrame,
      itemCol: String,
      depth: Int = 4,
      width: Int = 1024,
      salt: String = "cm"): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth x $width")
    probes
      .select(col(itemCol), explode(cellPairs(col(itemCol), depth, width, salt)).as("p"))
      .select(col(itemCol), col("p.row").as("row"), col("p.bucket").as("bucket"))
      .join(broadcast(sketchDf), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
