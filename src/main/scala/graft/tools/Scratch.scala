package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway plan-inspection main for perf iteration (not part of the
  * library surface; excluded from SparkEntry).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("graft.scan.repartition", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { t =>
      val df = if (t == "events") graft.Tables.events(spark, sfDir)
               else graft.Tables.load(spark, sfDir, t)
      df.cache().count()
    }
    val name = args.headOption.getOrElse("q97_pagerank")
    if (name == "micro") {
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val li = graft.Tables.lineitem(spark, sfDir)
      val ord = graft.Tables.orders(spark, sfDir)
      for (i <- 1 to 3) {
        println(s"--- iteration $i ---")
        t("scan lineitem 2 cols")(noop(li.select(col("l_orderkey"), col("l_suppkey"))))
        t("groupBy suppkey count")(noop(li.groupBy(col("l_suppkey")).count()))
        val j = li.select(col("l_orderkey"), col("l_suppkey"))
          .join(ord.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
        t("join only")(noop(j))
        val eL = j.select((col("l_suppkey") * 2 + 1).cast("long").as("src"),
          (col("o_custkey") * 2).cast("long").as("dst"))
        t("join+distinct")(noop(eL.distinct()))
        t("join+distinct+union")(noop {
          val e = eL.distinct()
          e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        })
      }
      spark.stop(); return
    }
    if (name == "q97cum") {
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"[cum] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      for (i <- 1 to 3) {
        println(s"--- iteration $i ---")
        val e = graft.Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
          .join(graft.Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2 + 1).cast("long").as("src"),
            (col("o_custkey") * 2).cast("long").as("dst"))
          .distinct()
        val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        if (i > 1) t("sym")(noop(sym))
        val od = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        if (i > 1) t("od")(noop(od))
        val n = od.agg(count(lit(1)).as("n"))
        val se = sym.join(od.withColumnRenamed("node", "__src"), col("src") === col("__src"))
          .select(col("src").as("__s"), col("dst").as("__d"), col("deg"))
          .repartition(col("__s"))
        if (i > 1) t("se")(noop(se))
        val noIn = od.select(col("node"))
          .join(sym.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
          .crossJoin(broadcast(n))
          .select(col("node"), (lit(0.15) / col("n")).as("pr"))
        if (i > 1) t("noIn")(noop(noIn))
        var r = od.select(col("node")).crossJoin(broadcast(n))
          .select(col("node"), (lit(1.0) / col("n")).as("pr"))
        for (k <- 1 to 2) {
          r = se.join(r.withColumnRenamed("node", "__r").hint("shuffle_hash"),
              col("__s") === col("__r"))
            .groupBy(col("__d").as("node"))
            .agg(sum(floor((col("pr") / col("deg")) * lit(1e12) + 0.5).cast("long")).as("__psum"))
            .crossJoin(broadcast(n))
            .select(col("node"), (lit(0.15) / col("n") +
              lit(0.85) * (col("__psum").cast("double") / lit(1e12))).as("pr"))
            .unionAll(noIn)
          val rr = r
          if (i > 1) t(s"round$k")(noop(rr))
        }
        val full = graft.llm.GraphRank.topK(
          r.withColumn("pr12", floor(col("pr") * lit(1e12) + 0.5).cast("long")), 20)
        t("full")(noop(full))
      }
      spark.stop(); return
    }
    if (name == "q97parts") {
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"[part] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
      }
      for (i <- 1 to 3) {
        println(s"--- iteration $i ---")
        val e = t("e build (join+distinct noop)") {
          val d = graft.Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
            .join(graft.Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
            .select(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
              concat(lit("c"), col("o_custkey").cast("string")).as("dst"))
            .distinct()
          d.write.format("noop").mode("overwrite").save(); d
        }
        val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        val base = t("base localCheckpoint")(sym.localCheckpoint())
        val od = base.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        val se = t("se build+ck") {
          base.join(od.withColumnRenamed("node", "__src"), col("src") === col("__src"))
            .select(col("src").as("__s"), col("dst").as("__d"), col("deg"))
            .repartition(col("__s")).localCheckpoint()
        }
        val n = od.agg(count(lit(1)).as("n"))
        val noIn = t("noIn build+ck") {
          od.select(col("node"))
            .join(base.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
            .crossJoin(broadcast(n))
            .select(col("node"), (lit(0.15) / col("n")).as("pr")).localCheckpoint()
        }
        var r = od.select(col("node")).crossJoin(broadcast(n))
          .select(col("node"), (lit(1.0) / col("n")).as("pr"))
        for (k <- 1 to 2) {
          r = se.join(r.withColumnRenamed("node", "__r").hint("shuffle_hash"),
              col("__s") === col("__r"))
            .groupBy(col("__d").as("node"))
            .agg(sum(floor((col("pr") / col("deg")) * lit(1e12) + 0.5).cast("long")).as("__psum"))
            .crossJoin(broadcast(n))
            .select(col("node"), (lit(0.15) / col("n") +
              lit(0.85) * (col("__psum").cast("double") / lit(1e12))).as("pr"))
            .unionAll(noIn)
          val rr = r
          t(s"round $k noop")(rr.write.format("noop").mode("overwrite").save())
        }
        t("topK")(graft.llm.GraphRank.topK(
          r.withColumn("pr12", floor(col("pr") * lit(1e12) + 0.5).cast("long")), 20)
          .write.format("noop").mode("overwrite").save())
      }
      spark.stop(); return
    }
    val eager = graft.queries.Catalog.eagerBuildQueries.contains(name)
    val d = graft.SparkEntry.queries(name)(spark, sfDir)
    d.explain("formatted")
    // timed runs (eager queries rebuild in-loop, matching the bench)
    d.write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val run = if (eager) graft.SparkEntry.queries(name)(spark, sfDir) else d
      run.write.format("noop").mode("overwrite").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // stage-level profile of one more execution
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), dur, si.numTasks))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val prof = if (eager) graft.SparkEntry.queries(name)(spark, sfDir) else d
    val t0 = System.nanoTime()
    prof.write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"profiled run: $wall%.3f s, ${stages.size} stages")
    stages.sortBy(_._1).foreach { case (id, nm, dur, nt) =>
      println(f"  stage $id%3d [$nt%3d tasks] $dur%5d ms  $nm")
    }
    spark.stop()
  }
}
