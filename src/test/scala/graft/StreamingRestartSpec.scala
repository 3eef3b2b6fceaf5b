package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming

/** Restart-from-checkpoint contract (round-15 ask #6): a stateful
  * streaming op must survive a stop/restart cycle — the per-key state
  * written to the checkpoint by query #1 must be recovered by query #2
  * (a NEW StreamingQuery over the same checkpoint + sink), and the
  * replayed source offsets must not duplicate output rows. This is the
  * standard failure-recovery contract a production monitor needs; the
  * in-session cross-micro-batch tests in StreamingSpec cannot see it
  * because they never tear the query down.
  *
  * Sink is a parquet FILE sink (exactly-once via the checkpoint's commit
  * log) — the memory sink used elsewhere in StreamingSpec refuses
  * checkpoint recovery in append mode by design.
  */
class StreamingRestartSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionizeClosed: open-session state survives query restart; no replay duplicates") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-restart-").toFile
    dir.deleteOnExit()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    val gap = 60L * 1000000 // 1 minute

    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def start() = Streaming.sessionizeClosed(
        mem.toDF().toDF("user_id", "ts"), "user_id", "ts", gap)
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    // Query #1: two events 30s apart — session 1 stays OPEN, so the ONLY
    // record of it is per-key state in the checkpoint when we stop.
    val q1 = start()
    mem.addData((1L, t("2024-06-01 10:00:00")), (1L, t("2024-06-01 10:00:30")))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() == 0,
      "open session must not emit before restart")

    // Query #2 over the same checkpoint: a >gap event must CLOSE session 1
    // with BOTH pre-restart events in it — n_events=2 and start_us from
    // batch 1 prove the state was recovered, not rebuilt from the new data.
    val q2 = start()
    mem.addData((1L, t("2024-06-01 10:05:00")))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 1, s"exactly one closed session, got ${rows.length}")
    val r = rows(0)
    assert(r.getAs[Long]("session_idx") == 1)
    assert(r.getAs[Long]("n_events") == 2)
    assert(r.getAs[Long]("start_us") == t("2024-06-01 10:00:00").getTime * 1000)
    assert(r.getAs[Long]("end_us") == t("2024-06-01 10:00:30").getTime * 1000)

    // Query #3: restart again and close session 2 — the frontier and the
    // session counter also came back (idx advances to 2, no duplicate of
    // session 1 from offset replay).
    val q3 = start()
    mem.addData((1L, t("2024-06-01 10:30:00")))
    q3.processAllAvailable()
    q3.stop()
    val all = spark.read.parquet(out).orderBy("session_idx").collect()
    assert(all.length == 2, s"sessions 1 and 2, got ${all.length}")
    assert(all(1).getAs[Long]("session_idx") == 2)
    assert(all(1).getAs[Long]("n_events") == 1)
    assert(all(1).getAs[Long]("start_us") == t("2024-06-01 10:05:00").getTime * 1000)
  }
}
