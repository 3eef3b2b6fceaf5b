package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected catalog queries — the
  * iterate-on-the-plan loop (pushdown / broadcast / codegen span checks).
  * Usage: runMain graft.Plans [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      // mirror the bench regime (Bench.scala) so dumped plans show the
      // shapes the bench actually executes: AQE off at this data scale
      // (ReuseExchange then appears at PLAN time, not as a runtime AQE
      // artifact), shuffle partitions 8
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.nonEmpty) args.toSet else Set("q01_pricing_summary", "q03_join_enrich", "q09_asof_join")
    queries.Catalog.all.filter(q => wanted.contains(q.name)).foreach { q =>
      println(s"\n========== ${q.name} ==========")
      println(q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
