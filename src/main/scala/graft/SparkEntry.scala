package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is one named query per implemented operator family from
  * SURVEY.md §2 (plus the large-scale pipeline operators); `oracleSql` is the
  * DuckDB-equivalent SQL for each, used by the driver's correctness gate.
  * Both are defined together in [[graft.queries.Catalog]] so a query and its
  * oracle can never drift apart.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the AS-OF join — the engine's most distinctive composed operator.
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.q09.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
