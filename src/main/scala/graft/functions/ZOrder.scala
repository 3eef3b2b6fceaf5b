package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys: interleave the bits of two bounded
  * dimensions so that sorting by the single key co-locates rows that are
  * close in BOTH dimensions — the multi-dimensional data-layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Rows sorted/range-
  * partitioned by a Morton key give min/max row-group pruning on EITHER
  * predicate column (a lexicographic sort gives it only on the leading
  * column) — at 100 TB this is the difference between scanning one
  * dimension's stripe and scanning everything when the query filters on
  * the second column.
  *
  * Built from pure integer bit arithmetic (shifts / masks / adds) —
  * engine-identical, codegen-friendly, and expressible in any SQL dialect
  * (the [[mortonSql]] twin) — no UDF.
  */
object ZOrder {

  /** Morton key of two dimensions, `bits` bits each (values are masked to
    * `bits` — callers bucket/clamp first): x occupies even bit positions,
    * y odd. `bits ≤ 31` keeps the key in a positive long.
    */
  def morton2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** SQL twin of [[morton2]] (DuckDB dialect; `>>`/`<<`/`&` on BIGINT). */
  def mortonSql(xSql: String, ySql: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"((($xSql) >> $i) & 1) << ${2 * i}",
        s"((($ySql) >> $i) & 1) << ${2 * i + 1}")
    }
    terms.map(t => s"($t)").mkString(" + ")
  }
}
