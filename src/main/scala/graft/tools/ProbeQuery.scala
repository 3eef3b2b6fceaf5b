package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: execute one catalog query and print the full failure stack. */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q102_ppr"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.queries.Catalog.all.find(_.name == name)
      .getOrElse(sys.error(s"no query $name"))
    try {
      q.run(spark, d).write.format("noop").mode("overwrite").save()
      println("OK: " + name)
    } catch {
      case e: Throwable =>
        var t: Throwable = e
        while (t != null) {
          println("CAUSE: " + t.getClass.getName + ": " +
            Option(t.getMessage).getOrElse("").linesIterator.take(4).mkString(" | "))
          t.getStackTrace.take(12).foreach(f => println("    at " + f))
          t = t.getCause
        }
    }
    spark.stop()
  }
}
