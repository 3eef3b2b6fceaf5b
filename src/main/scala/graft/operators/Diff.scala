package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: the added / removed / changed keys between two versions
  * of a keyed dataset — the regression gate run after every pipeline
  * rebuild ("the new corpus build should change ONLY the re-crawled
  * partitions"), and the row-level drill-down to
  * [[Fingerprint.datasetFingerprint]]'s group digests (the digest says a
  * group changed; the diff says WHICH keys and HOW).
  *
  * Change detection compares the [[Fingerprint.contentHash60]] of the
  * caller-chosen compare columns, so "changed" means content-changed, not
  * merely touched. Callers pass STRING-SAFE compare columns (integers /
  * strings; cast money to exact cents first) — cross-engine double
  * formatting is not stable and must not reach a hash.
  *
  * Plan shape (scale story): ONE full-outer equi-join on the key columns
  * — both sides hash-partition on the same key, there is no window, no
  * collect, and the filter dropping unchanged keys (the overwhelming
  * majority in a healthy rebuild) runs before any further consumer, so
  * the output is change-sized, not data-sized. At 100 TB this is the
  * canonical co-partitioned reconciliation join; with both snapshots
  * bucketed by key on disk it degrades to a zero-shuffle zip of buckets.
  */
object Diff {

  /** One row per differing key: (keyCols…, change_type ∈
    * {added, removed, changed}, old_hash, new_hash — null on the absent
    * side). Unchanged keys are dropped. Keys must be unique per snapshot
    * (it is a KEYED diff; dedupe first if not).
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select((keyCols.map(col) :+
      Fingerprint.contentHash60(compareCols.map(col)).as("old_hash")): _*)
    val n = newDf.select((keyCols.map(col) :+
      Fingerprint.contentHash60(compareCols.map(col)).as("new_hash")): _*)
    o.join(n, keyCols, "full_outer")
      .filter(col("old_hash").isNull || col("new_hash").isNull ||
        col("old_hash") =!= col("new_hash"))
      .select((keyCols.map(col) :+
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .otherwise("changed").as("change_type")
        :+ col("old_hash") :+ col("new_hash")): _*)
  }
}
