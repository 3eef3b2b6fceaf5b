package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: executed-plan exchange/subquery counts + SparkListener
  * job/stage tally for named catalog queries (floor-adjudication input;
  * not part of the engine surface).
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("graft.scan.repartition", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { t =>
      val df = if (t == "events") graft.Tables.events(spark, d)
               else graft.Tables.load(spark, d, t)
      df.cache().count()
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })
    names.foreach { n =>
      val qq = graft.queries.Catalog.all.find(_.name == n)
        .getOrElse(sys.error(s"no query $n"))
      // warm
      qq.run(spark, d).write.format("noop").mode("overwrite").save()
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val df = qq.run(spark, d)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val p = df.queryExecution.executedPlan.toString
      def c(pat: String) = pat.r.findAllIn(p).length
      println(f"$n%-28s ${sec}%.3f s  jobs=${jobs.get} stages=${stages.get} " +
        s"exch=${c("Exchange")} bhj=${c("BroadcastHashJoin")} " +
        s"smj=${c("SortMergeJoin")} objAgg=${c("ObjectHashAggregate")} " +
        s"win=${c("Window")}")
    }
    spark.stop()
  }
}
