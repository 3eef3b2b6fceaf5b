package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-time breakdown for named catalog queries under the scale-gate
  * regime (local[32], shuffle/repart from env, cached tables, warmed) —
  * the floor-adjudication evidence the round-14 verdict asks for on any
  * sf1 row that stays above the ratio bar: per stage, wall duration,
  * summed executor run time, task count, input / shuffle bytes. Dev
  * probe, not engine surface.
  *
  * Usage: StageProfile q97_pagerank [q102_ppr ...]
  *   env: SPARK_GRAFT_SF_DIR (default gendata/sf1), SPARK_GRAFT_SHUFFLE,
  *        SPARK_GRAFT_REPART (default 32/32 — the gate's setting), WARMS
  */
object StageProfile {
  private case class St(id: Int, attempt: Int, name: String, wallMs: Long,
      execRunMs: Long, tasks: Int, inputMB: Double, shReadMB: Double,
      shWriteMB: Double)

  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    require(names.nonEmpty, "usage: StageProfile <queryName> [more...]")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "gendata/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("graft.scan.repartition",
        sys.env.getOrElse("SPARK_GRAFT_REPART", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { t =>
      val df = if (t == "events") graft.Tables.events(spark, d)
               else graft.Tables.load(spark, d, t)
      df.cache().count()
    }
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (recording.get) {
          val i = e.stageInfo
          val m = i.taskMetrics
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          stages.add(St(i.stageId, i.attemptNumber, i.name.takeWhile(_ != '\n'),
            wall, m.executorRunTime, i.numTasks,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6))
        }
    })
    val warms = sys.env.getOrElse("WARMS", "3").toInt
    names.foreach { n =>
      val qq = graft.queries.Catalog.all.find(_.name == n)
        .getOrElse(sys.error(s"no query $n"))
      val df = qq.run(spark, d)
      (1 to warms).foreach { _ =>
        df.write.format("noop").mode("overwrite").save()
      }
      System.gc(); Thread.sleep(300)
      stages.clear(); recording.set(true)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      recording.set(false); Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq.sortBy(-_.wallMs)
      println(f"\n== $n%-24s total ${sec}%.3f s  " +
        f"(${ss.size} stages, wall-sum ${ss.map(_.wallMs).sum / 1e3}%.3f s, " +
        f"exec-run-sum ${ss.map(_.execRunMs).sum / 1e3}%.3f s)")
      println(f"${"wall_s"}%8s ${"run_s"}%8s ${"tasks"}%5s ${"in_MB"}%8s " +
        f"${"shR_MB"}%8s ${"shW_MB"}%8s  stage")
      ss.foreach { s =>
        println(f"${s.wallMs / 1e3}%8.3f ${s.execRunMs / 1e3}%8.3f " +
          f"${s.tasks}%5d ${s.inputMB}%8.1f ${s.shReadMB}%8.1f " +
          f"${s.shWriteMB}%8.1f  [${s.id}.${s.attempt}] ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
