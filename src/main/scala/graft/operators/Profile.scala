package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling (reference A7 missing-value profile,
  * `app/streamlit_app.py:142-148`).
  */
object Profile {

  /** Per-column null fraction, one output row per column:
    * (column_name, null_frac, n_null). Single pass, single partial+final
    * aggregate over all columns at once (NOT one job per column).
    */
  def missingProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"__n_$c"),
        avg(col(c).isNull.cast("double")).as(s"__f_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single row to long form with a stack expression
    val stackArgs = cols
      .map(c => s"'$c', __n_$c, __f_$c")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (column_name, n_null, null_frac)")
  }
}
