package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles (`quantile_cont` semantics) in distributed
  * form: pre-aggregate (group, value) counts — a codegen hash aggregate
  * with full map-side combine — then a cumulative-count window over the
  * *distinct values* of each group, reading off the two bracketing values
  * per requested quantile.
  *
  * Versus the built-in `percentile` aggregate (ObjectHashAggregate): the
  * heavy stage stays in whole-stage codegen, the shuffle carries one row
  * per distinct (group, value) instead of per input row, and executor
  * memory is bounded by distinct values rather than group size — the shape
  * that survives groups of 10⁹ rows. The final ordered pass per group is
  * over distinct values only (the irreducible part of an exact quantile).
  *
  * Interpolation matches `Percentile.getPercentile` / DuckDB
  * `quantile_cont`: position p·(n−1); result
  * `(⌈pos⌉ − pos)·v[⌊pos⌋] + (pos − ⌊pos⌋)·v[⌈pos⌉]`.
  */
object Quantiles {

  /** @param df       input rows
    * @param groupCol grouping column name
    * @param valueCol numeric column (cast to double; NULLs ignored)
    * @param ps       (p, output column name) per requested quantile
    * @return one row per group: groupCol, then one double column per p
    */
  def quantileCont(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(Double, String)]): DataFrame = {
    val v = col(valueCol).cast("double")
    val counts = df.filter(v.isNotNull)
      .groupBy(col(groupCol).as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    val staged = counts
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))

    def pos = (n: org.apache.spark.sql.Column) => (c: Double) => lit(c) * (n - 1)
    // value at 0-based sorted index i = first distinct value with cum > i
    val aggs = ps.flatMap { case (p, name) =>
      val pp = pos(col("__n"))(p)
      Seq(
        min(when(col("__cum") > floor(pp), col("__v"))).as(s"__lo_$name"),
        min(when(col("__cum") > ceil(pp), col("__v"))).as(s"__hi_$name"))
    } :+ max(col("__n")).as("__n")

    val outs = ps.map { case (p, name) =>
      val pp = lit(p) * (col("__n") - 1)
      val lower = floor(pp)
      val higher = ceil(pp)
      when(lower === higher, col(s"`__lo_$name`"))
        .otherwise((higher - pp) * col(s"`__lo_$name`") + (pp - lower) * col(s"`__hi_$name`"))
        .as(name)
    }

    staged.groupBy(col("__g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select((col(groupCol) +: outs): _*)
  }
}
