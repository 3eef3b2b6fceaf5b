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
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("graft.scan.repartition",
        sys.env.getOrElse("SPARK_GRAFT_REPART", "8"))
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
    if (name == "debug_nb3") {
      // memoized-model variant: cache() the (label, token, c) sufficient
      // statistic so rebuilds hit the CacheManager by plan canonicalization
      // (the IVF-quantizer serving convention) — with and without a
      // broadcast model join.
      import org.apache.spark.sql.functions._
      def variant(label: String, memo: Boolean, bcast: Boolean): Unit = {
        for (i <- 1 to 5) {
          val docs = graft.Tables.documents(spark, sfDir)
          val t0 = System.nanoTime()
          val (model, stats) = graft.llm.NaiveBayes.train(docs, "lang", "text")
          val model2 = if (memo) model.cache() else model
          val stats2 = if (memo) stats.cache() else stats
          graft.llm.NaiveBayes.predict(docs, "doc_id", "text", model2, stats2,
              broadcastModel = bcast)
            .select(col("doc_id"), col("label").as("pred_lang"), col("score4"))
            .write.format("noop").mode("overwrite").save()
          println(f"[nb3 $label] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      variant("memo+bcast ", memo = true, bcast = true)
      variant("memo+shuffl", memo = true, bcast = false)
      variant("plain+bcast", memo = false, bcast = true)
      variant("memo+bcast2", memo = true, bcast = true)
      spark.stop(); return
    }
    if (name == "debug_nb2") {
      // prototype: tokenize ONCE (ck), collect the C-row class stats as a
      // model artifact, broadcast the token model — how few jobs can a
      // self-train NB rebuild cost?
      import org.apache.spark.sql.functions._
      def log4(x: org.apache.spark.sql.Column) =
        floor(log(x) * 10000 + 0.5).cast("long")
      def build(): org.apache.spark.sql.DataFrame = {
        val docs = graft.Tables.documents(spark, sfDir)
        val tok = docs.select(col("doc_id"), col("lang").as("label"),
            explode(split(col("text"), " ")).as("token"))
          .localCheckpoint()
        val cnt = tok.groupBy(col("label"), col("token")).agg(count(lit(1)).as("c"))
        // ONE action: C-row class stats (t, v, prior4, lp0) — k-bounded
        val stats = cnt.groupBy(col("label")).agg(sum(col("c")).as("t"))
          .crossJoin(broadcast(cnt.select(col("token")).distinct()
            .agg(count(lit(1)).as("v"))))
          .join(tok.groupBy(col("label")).agg(count_distinct(col("doc_id")).as("dl")), "label")
          .crossJoin(broadcast(tok.agg(count_distinct(col("doc_id")).as("d"))))
          .select(col("label"), col("t"), col("v"),
            log4(col("dl").cast("double") / col("d")).as("prior4"),
            log4(lit(1.0) / (col("t") + col("v"))).as("lp0"))
          .collect()
        val statsDf = spark.createDataFrame(
          spark.sparkContext.parallelize(stats.toIndexedSeq, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("prior4", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("lp0", org.apache.spark.sql.types.LongType))))
        val model = cnt.join(broadcast(statsDf.select("label", "t", "v")), "label")
          .select(col("label"), col("token"),
            log4((col("c") + lit(1.0)) / (col("t") + col("v"))).as("lp4"))
        val docTok = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("m"))
        val docM = docTok.groupBy(col("doc_id")).agg(sum(col("m")).as("mm"))
        val matched = docTok.join(broadcast(model), "token")
          .groupBy(col("doc_id"), col("label"))
          .agg(sum(col("m") * col("lp4")).as("s"), sum(col("m")).as("cov"))
        val scores = docM.crossJoin(broadcast(statsDf.select("label", "prior4", "lp0")))
          .join(matched, Seq("doc_id", "label"), "left")
          .select(col("doc_id"), col("label"),
            (col("prior4") + coalesce(col("s"), lit(0L)) +
              (col("mm") - coalesce(col("cov"), lit(0L))) * col("lp0")).as("score4"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("score4").desc, col("label").asc)
        scores.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .select(col("doc_id"), col("label").as("pred_lang"), col("score4"))
      }
      for (i <- 1 to 6) {
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        println(f"[nb2] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.stop(); return
    }
    if (name == "debug_ppr") {
      // q102 cost decomposition: edge-build materialization variants, then
      // full-PPR variants (current se-decorated rounds vs raw-edge rounds
      // with the share precomputed on the broadcast side).
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.DataFrame
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"[ppr2] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
      }
      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def eDistinct: DataFrame = {
        val ord = graft.Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"))
        graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2 + 1).cast("long").as("src"),
            (col("o_custkey") * 2).cast("long").as("dst"))
          .distinct()
      }
      def symUnion: DataFrame = {
        val e = eDistinct
        e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      }
      def symExplode: DataFrame = eDistinct
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
      val edgeIters = sys.env.getOrElse("SPARK_GRAFT_EDGE_ITERS", "0").toInt
      for (i <- 1 to edgeIters) {
        println(s"--- edge-build iteration $i ---")
        t("lazy sym (noop)")(noop(symUnion))
        t("ck sym union")(symUnion.localCheckpoint())
        t("ck sym explode")(symExplode.localCheckpoint())
        t("cache sym count") {
          val c = symUnion.cache(); c.count(); c.unpersist(blocking = true)
        }
        t("ck e half")(eDistinct.localCheckpoint())
      }
      def seeds = graft.Tables.supplier(spark, sfDir)
        .filter(col("s_nationkey") === 7)
        .select((col("s_suppkey") * 2 + 1).cast("long").as("node"))
      def pprFull(sym: DataFrame): Unit =
        noop(graft.llm.GraphRank.topK(
          graft.llm.GraphRank.personalizedPageRank(sym, "src", "dst",
            seeds, "node", rounds = 2, validate = false,
            reuseFrames = true, broadcastRanks = true, symmetric = true), 20))
      def eDistinctHash: DataFrame = {
        val ord = graft.Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"))
        graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2 + 1).cast("long").as("src"),
            (col("o_custkey") * 2).cast("long").as("dst"))
          .distinct()
      }
      def symExplodeHash: DataFrame = eDistinctHash
        .select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
      // fully-lazy single-plan replica: no checkpoints, no driver actions;
      // ns rides a 1-row broadcast frame; the repeated edge subtree is
      // deduped by ReuseExchange inside the one job
      def pprLazy(sym: DataFrame): DataFrame = {
        val sd = seeds.distinct()
        val nsF = sd.agg(count(lit(1)).cast("double").as("__ns"))
        val od = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        val odT = od
          .join(broadcast(sd.withColumn("__isSeed", lit(1))), Seq("node"), "left")
          .crossJoin(broadcast(nsF))
          .select(col("node"), col("deg"),
            when(col("__isSeed").isNotNull, lit(1.0) / col("__ns"))
              .otherwise(lit(0.0)).as("tele"))
        var r: DataFrame = odT.select(col("node"), col("tele").as("pr"))
        var ranks: DataFrame = null
        for (k <- 1 to 2) {
          val w = odT
            .join(broadcast(r.filter(col("pr") =!= 0.0)
                .select(col("node").as("__rn"), col("pr"))),
              col("node") === col("__rn"))
            .select(col("node").as("__r"),
              floor((col("pr") / col("deg")) * lit(1e12) + 0.5)
                .cast("long").as("__c"))
          val contrib = sym.join(broadcast(w), col("src") === col("__r"))
            .groupBy(col("dst").as("__an"))
            .agg(sum(col("__c")).as("__psum"))
          ranks = if (k < 2) {
            contrib.join(odT.filter(col("tele") > 0)
                .select(col("node"), col("tele")),
              col("__an") === col("node"), "full_outer")
              .select(coalesce(col("node"), col("__an")).as("node"),
                (lit(0.15) * coalesce(col("tele"), lit(0.0)) + lit(0.85) *
                  (coalesce(col("__psum"), lit(0L)).cast("double") / lit(1e12)))
                  .as("pr"))
          } else odT
            .join(broadcast(contrib), col("node") === col("__an"), "left")
            .select(col("node"),
              (lit(0.15) * col("tele") + lit(0.85) *
                (coalesce(col("__psum"), lit(0L)).cast("double") / lit(1e12)))
                .as("pr"))
          r = ranks
        }
        graft.llm.GraphRank.topK(ranks
          .withColumn("pr12", floor(col("pr") * lit(1e12) + 0.5).cast("long")), 20)
      }
      for (i <- 1 to 3) {
        println(s"--- full-ppr iteration $i ---")
        t("ppr eager (explode bcast)")(pprFull(symExplode))
        t("ppr lazy 1-job (explode)")(noop(pprLazy(symExplode)))
      }
      // prepared-statement regime: analyze once, execute thrice
      val prepared = pprLazy(symExplode)
      for (i <- 1 to 3) t(s"ppr lazy prepared run $i")(noop(prepared))
      // the REAL operator's lazy path, prepared
      def realLazy = graft.llm.GraphRank.topK(
        graft.llm.GraphRank.personalizedPageRank(symExplode, "src", "dst",
          seeds, "node", rounds = 2, validate = false,
          reuseFrames = false, broadcastRanks = true, symmetric = true), 20)
      val preparedReal = realLazy
      for (i <- 1 to 3) t(s"ppr REAL prepared run $i")(noop(preparedReal))
      spark.stop(); return
    }
    if (name == "debug_ck") {
      // which frames to materialize for the 2-round bench shape? Inline
      // pageRank replica with independent ck knobs on base / se / rounds.
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.DataFrame
      def pr(ckBase: Boolean, ckSe: Boolean, ckRounds: Boolean): DataFrame = {
        val ord = graft.Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"))
        val e = graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2 + 1).cast("long").as("src"),
            (col("o_custkey") * 2).cast("long").as("dst"))
          .distinct()
        val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        val base = if (ckBase) sym.localCheckpoint() else sym
        val od = base.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        val nv = od.count().toDouble
        val seRaw = base.join(broadcast(od.select(col("node").as("__on"), col("deg"))),
            col("src") === col("__on"))
          .select(col("src").as("__s"), col("dst").as("__d"), col("deg").as("__sdeg"))
        val se = if (ckSe) seRaw.localCheckpoint() else seRaw
        var r: DataFrame = od.select(col("node"), lit(1.0 / nv).as("pr"))
        var ranks: DataFrame = null
        for (k <- 1 to 2) {
          ranks = se.join(broadcast(r.withColumnRenamed("node", "__r")),
              col("__s") === col("__r"))
            .groupBy(col("__d").as("node"))
            .agg(sum(floor((col("pr") / col("__sdeg")) * lit(1e12) + 0.5)
              .cast("long")).as("__psum"))
            .select(col("node"), (lit(0.15 / nv) +
              lit(0.85) * (col("__psum").cast("double") / lit(1e12))).as("pr"))
          if (k < 2) r = if (ckRounds) ranks.localCheckpoint() else ranks
        }
        graft.llm.GraphRank.topK(
          ranks.withColumn("pr12", floor(col("pr") * lit(1e12) + 0.5).cast("long")), 20)
      }
      def run(label: String, b: Boolean, s: Boolean, rr: Boolean): Unit = {
        for (i <- 1 to 5) {
          val t0 = System.nanoTime()
          pr(b, s, rr).write.format("noop").mode("overwrite").save()
          println(f"[ck $label] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      run("base+se+rounds", b = true, s = true, rr = true)
      run("base only     ", b = true, s = false, rr = false)
      run("base+rounds   ", b = true, s = false, rr = true)
      run("none          ", b = false, s = false, rr = false)
      run("base+se       ", b = true, s = true, rr = false)
      run("base+se+rounds", b = true, s = true, rr = true)
      run("base only     ", b = true, s = false, rr = false)
      spark.stop(); return
    }
    if (name == "debug_gc") {
      // hypothesis probe: does the bench's per-query System.gc() trigger a
      // ContextCleaner storm that lands INSIDE the timed loop? A/B the q97
      // eager rebuild with and without a gc before each run.
      def runs(label: String, gcBefore: Boolean, n: Int): Unit = {
        for (i <- 1 to n) {
          if (gcBefore) { System.gc(); Thread.sleep(100) }
          val t0 = System.nanoTime()
          graft.SparkEntry.queries("q97_pagerank")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"[gc=$gcBefore $label] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      runs("warm", gcBefore = false, 6)
      runs("with-gc", gcBefore = true, 6)
      runs("no-gc", gcBefore = false, 6)
      runs("with-gc2", gcBefore = true, 6)
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
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/plan_$name.txt"),
      d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
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
