package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-order Markov transition matrix of an event stream: per entity,
  * order events by time and count (state → next state) steps, then
  * row-normalize — the behavioral fingerprint behind "what happens after
  * an error?", next-event prediction baselines, and bot/anomaly detection
  * (a scripted client's transition rows are near-deterministic; compare
  * with [[Profile.categoricalEntropy]] per row for exactly that check).
  *
  * Plan shape (scale story): ONE window partitioned BY ENTITY (`lead`
  * over each entity's own events — entities parallelize across executors;
  * never a global sort) + one bounded (state, next) aggregate (map-side
  * combined to ≤|states|² rows per partition). Ordering ties are split by
  * the caller's unique tie-break column, so the chain — and therefore the
  * matrix — is bit-identical cross-engine. Probabilities are exact
  * integer-count divisions (IEEE, engine-identical).
  */
object Transitions {

  /** One row per observed transition: (`from_state`, `to_state`, `n`,
    * `n_from`, `p` = n / n_from). Each entity's last event has no
    * successor and contributes no row.
    */
  def matrix(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      stateCol: String,
      tieBreak: Column): DataFrame = {
    val steps = df
      .select(col(entityCol), col(tsCol), col(stateCol).as("from_state"),
        tieBreak.as("__tb"))
      .withColumn("to_state", lead(col("from_state"), 1).over(
        Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col("__tb"))))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = steps.groupBy(col("from_state")).agg(sum(col("n")).as("n_from"))
    steps.join(fromTotals, "from_state")
      .select(col("from_state"), col("to_state"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from")).as("p"))
  }
}
