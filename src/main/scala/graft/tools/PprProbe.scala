package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch phase-timer for q102's PPR plan (not part of the engine
  * surface; delete when the investigation closes).
  */
object PprProbe {
  def main(args: Array[String]): Unit = {
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
    Seq("lineitem", "orders", "supplier").foreach { t =>
      Tables.load(spark, d, t).cache().count()
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (it <- 1 to 3) {
      println(s"--- iteration $it")
      val e = time("edge build (distinct)") {
        val x = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey"))
          .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2 + 1).cast("long").as("src"),
            (col("o_custkey") * 2).cast("long").as("dst"))
          .distinct()
        x
      }
      val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val base = time("ck(base)")(sym.localCheckpoint())
      val od = base.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val seeds = Tables.load(spark, d, "supplier")
        .filter(col("s_nationkey") === 7)
        .select((col("s_suppkey") * 2 + 1).cast("long").as("node"))
      val sd = seeds.distinct()
      time("seed check") {
        sd.join(od, Seq("node"), "left_anti").limit(1).collect()
      }
      val nSeed = sd.agg(count(lit(1)).as("ns"))
      val odT = time("ck(odT)") {
        od.join(broadcast(sd.withColumn("__isSeed", lit(1))), Seq("node"), "left")
          .crossJoin(broadcast(nSeed))
          .select(col("node"), col("deg"),
            when(col("__isSeed").isNotNull, lit(1.0) / col("ns"))
              .otherwise(lit(0.0)).as("tele"))
          .localCheckpoint()
      }
      val pprDst = base.select(col("dst").as("node")).distinct()
        .withColumn("__hasIn", lit(1))
      val noInR = time("ck(noInR)") {
        odT.join(broadcast(pprDst), Seq("node"), "left")
          .filter(col("__hasIn").isNull)
          .select(col("node"), col("deg"), col("tele"),
            (lit(0.15) * col("tele")).as("pr"))
          .localCheckpoint()
      }
      val se = base.select(col("src").as("__s"), col("dst").as("__d"))
      var r = odT.select(col("node"), col("deg"), col("tele"), col("tele").as("pr"))
      for (k <- 1 to 2) {
        val ranks = se
          .join(broadcast(r.withColumnRenamed("node", "__r")),
            col("__s") === col("__r"))
          .groupBy(col("__d").as("node"))
          .agg(sum(floor((col("pr") / col("deg")) * lit(1e12) + 0.5)
            .cast("long")).as("__psum"))
          .join(broadcast(odT), Seq("node"))
          .select(col("node"), col("deg"), col("tele"),
            (lit(0.15) * col("tele") +
              lit(0.85) * (col("__psum").cast("double") / lit(1e12))).as("pr"))
          .unionAll(noInR)
        r = if (k < 2) time(s"ck(round $k)")(ranks.localCheckpoint())
            else ranks
      }
      time("final topK") {
        graft.llm.GraphRank.topK(
          r.withColumn("pr12", floor(col("pr") * lit(1e12) + 0.5).cast("long"))
            .select(col("node"), col("pr12")), 20)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
