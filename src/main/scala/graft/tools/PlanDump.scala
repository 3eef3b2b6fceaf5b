package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the executed plan of a named catalog query (exchange/reuse audit).
  * Dev probe, not engine surface. Usage: PlanDump <queryName> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.queries.Catalog.all.find(_.name == name)
      .getOrElse(sys.error(s"no query $name"))
    val df = q.run(spark, d)
    val p = df.queryExecution.executedPlan.toString
    def c(pat: String) = pat.r.findAllIn(p).length
    println(s"Exchange(hash): ${c("Exchange hashpartitioning")}  " +
      s"ReusedExchange: ${c("ReusedExchange")}  " +
      s"BroadcastExchange: ${c("BroadcastExchange")}  " +
      s"Subquery: ${c("Subquery")}")
    println(p)
    spark.stop()
  }
}
