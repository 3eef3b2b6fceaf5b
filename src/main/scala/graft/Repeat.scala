package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one catalog query N times in a single JVM — separates
  * per-query fixed overhead (planning, codegen, first-call classloading)
  * from steady-state execution. Usage: runMain graft.Repeat <name> [n]
  */
object Repeat {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.get("SPARK_GRAFT_AQE").map(_.trim).filter(_.nonEmpty).getOrElse("false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // mirror Bench's buffer-pool condition
    Tables.names.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      df.cache().count()
    }
    val q = queries.Catalog.all.find(_.name == name).getOrElse(sys.error(s"no query $name"))
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[repeat] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
