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
    if (name == "debug_pagerank") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.DataFrame
      def edges(bcast: Boolean): DataFrame = {
        val ord0 = graft.Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"))
        val ord = if (bcast) broadcast(ord0) else ord0
        val e = graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2 + 1).cast("long").as("src"),
            (col("o_custkey") * 2).cast("long").as("dst"))
          .distinct()
        e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      }
      def variant(label: String, bcastE: Boolean, reuse: Boolean): Unit = {
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          graft.llm.GraphRank.topK(
              graft.llm.GraphRank.pageRank(edges(bcastE), "src", "dst",
                rounds = 2, validate = false, reuseFrames = reuse,
                broadcastRanks = true, symmetric = true), 20)
            .write.format("noop").mode("overwrite").save()
          println(f"[$label] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      variant("base       ", bcastE = false, reuse = true)
      variant("bcastE     ", bcastE = true, reuse = true)
      variant("bcastE-lazy", bcastE = true, reuse = false)
      variant("lazy       ", bcastE = false, reuse = false)
      def pprVariant(label: String, bcastE: Boolean, reuse: Boolean): Unit = {
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          val seeds = graft.Tables.supplier(spark, sfDir)
            .filter(col("s_nationkey") === 7)
            .select((col("s_suppkey") * 2 + 1).cast("long").as("node"))
          graft.llm.GraphRank.topK(
              graft.llm.GraphRank.personalizedPageRank(edges(bcastE), "src", "dst",
                seeds, "node", rounds = 2, validate = false, reuseFrames = reuse,
                broadcastRanks = true, symmetric = true), 20)
            .write.format("noop").mode("overwrite").save()
          println(f"[ppr $label] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      pprVariant("reuse", bcastE = true, reuse = true)
      pprVariant("lazy ", bcastE = true, reuse = false)
      spark.stop(); return
    }
    if (name == "debug_nb") {
      import org.apache.spark.sql.functions._
      def variant(label: String, reuse: Boolean): Unit = {
        for (i <- 1 to 4) {
          val docs = graft.Tables.documents(spark, sfDir)
          val t0 = System.nanoTime()
          val (model, stats) = graft.llm.NaiveBayes.train(docs, "lang", "text",
            reuseFrames = reuse)
          graft.llm.NaiveBayes.predict(docs, "doc_id", "text", model, stats)
            .select(col("doc_id"), col("label").as("pred_lang"), col("score4"))
            .write.format("noop").mode("overwrite").save()
          println(f"[nb $label] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      variant("lazy ", reuse = false)
      variant("reuse", reuse = true)
      variant("lazy ", reuse = false)
      variant("reuse", reuse = true)
      spark.stop(); return
    }
    if (name == "debug_components") {
      import org.apache.spark.sql.functions._
      val docs = graft.Tables.documents(spark, sfDir)
      val pairs = graft.llm.MinHashLsh
        .nearDupPairs(docs, "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .persist()
      println(s"pairs: ${pairs.count()}")
      val prop = graft.llm.DedupCluster.components(pairs, "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val auto = graft.llm.DedupCluster.components(pairs, "a", "b",
          algorithm = graft.llm.DedupCluster.Auto)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"prop: ${prop.size} labels, ${prop.map(_._2).size} -> reps ${prop.map(_._2).toSeq.distinct.size}")
      println(s"auto: ${auto.size} labels, reps ${auto.map(_._2).toSeq.distinct.size}")
      println(s"auto minus prop: ${(auto -- prop).toSeq.sortBy(_._1).take(20)}")
      println(s"prop minus auto: ${(prop -- auto).toSeq.sortBy(_._1).take(20)}")
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
