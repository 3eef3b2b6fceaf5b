package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streaming

case class Ev(ts: java.sql.Timestamp, k: String, v: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(s: String, k: String, v: Double) = Ev(java.sql.Timestamp.valueOf(s), k, v)

  test("streaming 10-min bin agg produces the same bins as batch") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      ev("2024-06-01 10:01:00", "a", 1.0),
      ev("2024-06-01 10:05:00", "a", 3.0),
      ev("2024-06-01 10:11:00", "a", 5.0),
      ev("2024-06-01 10:02:00", "b", 7.0))
    val q = Streaming.binAgg(mem.toDF(), "ts", Seq("k"), "v")
      .writeStream.outputMode("complete")
      .format("memory").queryName("bins")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("bins").orderBy("k", "bin_start").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("n") == 2L && got(0).getAs[Double]("avg_value") == 2.0)
    assert(got(1).getAs[Long]("n") == 1L && got(1).getAs[Double]("sum_value") == 5.0)
    // unified semantics: identical transform on the same data as a batch DF
    val batch = Streaming.binAgg(
      Seq(ev("2024-06-01 10:01:00", "a", 1.0), ev("2024-06-01 10:05:00", "a", 3.0),
        ev("2024-06-01 10:11:00", "a", 5.0), ev("2024-06-01 10:02:00", "b", 7.0)).toDF(),
      "ts", Seq("k"), "v").orderBy("k", "bin_start").collect()
    assert(batch.map(_.toString).sameElements(got.map(_.toString)))
  }

  test("streaming session windows merge on gap≤30min, split beyond") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      ev("2024-06-01 10:00:00", "a", 1.0),
      ev("2024-06-01 10:20:00", "a", 2.0),  // 20 min gap → same session
      ev("2024-06-01 11:00:00", "a", 4.0),  // 40 min gap → new session
      ev("2024-06-01 10:00:00", "b", 8.0))
    val q = Streaming.sessionAgg(mem.toDF(), "ts", Seq("k"), "v")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions").orderBy("k", "session_start").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("n") == 2L && got(0).getAs[Double]("sum_value") == 3.0)
    assert(got(1).getAs[Long]("n") == 1L && got(1).getAs[Double]("sum_value") == 4.0)
    assert(got(2).getAs[String]("k") == "b")
    // batch DF through the identical transform agrees (unified semantics)
    val batch = Streaming.sessionAgg(
      Seq(ev("2024-06-01 10:00:00", "a", 1.0), ev("2024-06-01 10:20:00", "a", 2.0),
        ev("2024-06-01 11:00:00", "a", 4.0), ev("2024-06-01 10:00:00", "b", 8.0)).toDF(),
      "ts", Seq("k"), "v").orderBy("k", "session_start").collect()
    assert(batch.map(_.toString).sameElements(got.map(_.toString)))
  }

  test("session gap boundary: exactly 30 min merges (inclusive), 30:01 splits") {
    // guards the q45 oracle alignment: Spark merges an event whose gap is
    // <= gapDuration (inclusive at exactly the gap), so the islands oracle
    // must break strictly on gap > threshold
    val exact = Seq(
      ev("2024-06-01 10:00:00", "a", 1.0),
      ev("2024-06-01 10:30:00", "a", 2.0)).toDF() // gap == 30:00
    val over = Seq(
      ev("2024-06-01 10:00:00", "a", 1.0),
      ev("2024-06-01 10:30:01", "a", 2.0)).toDF() // gap == 30:01
    assert(Streaming.sessionAgg(exact, "ts", Seq("k"), "v").count() == 1)
    assert(Streaming.sessionAgg(over, "ts", Seq("k"), "v").count() == 2)
  }

  test("streaming near-dup filter: later exact dup flagged against first-seen keeper") {
    implicit val sql = spark.sqlContext
    val same = "the quick brown fox jumps over the lazy dog near the river"
    val mem = MemoryStream[(Long, String)]
    // one RUNNING query across both micro-batches — state (the band-key
    // index) lives in the query; restarting without a checkpoint would
    // reprocess from scratch
    val s = Streaming.nearDupCandidates(mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup")
      .start()
    // batch 1: the original + one unrelated doc
    mem.addData((10L, same), (11L, "completely different content about engines and plans"))
    s.processAllAvailable()
    assert(spark.table("neardup").count() == 0) // nothing collides yet
    // batch 2: an exact duplicate arrives later → flagged in ALL bands
    // against the FIRST-SEEN keeper (10), regardless of its lower id
    mem.addData((5L, same))
    s.processAllAvailable(); s.stop()
    val got = spark.table("neardup").collect()
      .map(r => (r.getAs[Long]("dup_id"), r.getAs[Long]("kept_id")))
    assert(got.length == 4) // 4 bands, all colliding for an exact dup
    assert(got.forall(_ == (5L, 10L)))

    // batch mode: same transform, keeper degenerates to min id
    val batch = Streaming.nearDupCandidates(
      Seq((10L, same), (11L, "completely different content about engines and plans"), (5L, same))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("dup_id"), r.getAs[Long]("kept_id")))
    assert(batch.length == 4)
    assert(batch.forall(_ == (10L, 5L)))
  }

  test("TTL near-dup filter evicts an idle keeper and re-admits the key") {
    implicit val sql = spark.sqlContext
    val same = "the quick brown fox jumps over the lazy dog near the river"
    val mem = MemoryStream[(Long, String)]
    // processAllAvailable CANNOT be used here: with ProcessingTimeTimeout the
    // engine must keep constructing batches to fire future timeouts
    // (FlatMapGroupsWithStateExec.shouldRunAnotherBatch ≡ true), so the
    // no-new-data signal it waits on never arrives. Poll the sink/progress
    // instead — the documented pattern for timeout-based stateful queries.
    // ttl must comfortably exceed one micro-batch duration (so the doc-5 →
    // doc-7 window below cannot expire mid-test) while keeping the eviction
    // sleep short: 2 s against ~100–300 ms batches
    val s = Streaming.nearDupCandidatesTtl(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", ttl = "2 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_ttl")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    // cumulative SOURCE rows (documents) ingested, tracked by batchId so
    // recentProgress rotation during the continuous timeout batches cannot
    // lose a data batch
    var seenBatch = -1L
    var ingested = 0L
    def awaitDocsIngested(n: Long): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (ingested < n && System.currentTimeMillis < deadline) {
        s.recentProgress.filter(_.batchId > seenBatch).sortBy(_.batchId)
          .foreach { p => seenBatch = p.batchId; ingested += p.numInputRows }
        Thread.sleep(50)
      }
      assert(ingested >= n, s"timed out waiting for $n ingested docs")
    }
    try {
      // batch 1: doc 10 claims its band keys
      mem.addData((10L, same))
      awaitDocsIngested(1)
      assert(spark.table("neardup_ttl").count() == 0)
      // idle past the TTL: the engine's own timeout batches fire hasTimedOut
      // for doc 10's band keys and remove the keeper state
      Thread.sleep(3000)
      // the keys are free again: an exact dup of doc 10 arriving AFTER the
      // horizon is admitted as the NEW keeper, not flagged against 10
      mem.addData((5L, same))
      awaitDocsIngested(2)
      assert(spark.table("neardup_ttl").count() == 0)
      // ...and a further dup arriving WITHIN the horizon is flagged against
      // the new keeper 5
      mem.addData((7L, same))
      val deadline = System.currentTimeMillis + 30000
      while (spark.table("neardup_ttl").count() < 4 &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
      val got = spark.table("neardup_ttl").collect()
        .map(r => (r.getAs[Long]("dup_id"), r.getAs[Long]("kept_id")))
      assert(got.length == 4) // all 4 bands collide for an exact dup
      assert(got.forall(_ == (7L, 5L)))
    } finally s.stop() // never leak the continuously-triggering query
  }

  test("streaming corpus scrub: redaction + quality signals run per-micro-batch, batch-identical") {
    // the whole scrub family is stateless Column expressions, so it lifts
    // onto a stream unchanged — this pins that no hidden batch-only
    // construct (window, collect, eager build) sneaks into the scrub path
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.llm.{Redaction, TextAnalysis}
    val mem = MemoryStream[(Long, String)]
    val docs = Seq(
      (1L, "mail me at a@b.co from 10.0.0.1 the a of and to x y x"),
      (2L, "clean text only here"))
    mem.addData(docs: _*)
    def scrub(df: org.apache.spark.sql.DataFrame) = df
      .select(col("_1").as("id"),
        Redaction.redact(col("_2")).as("red"),
        Redaction.piiTotal(col("_2")).as("n_pii"),
        TextAnalysis.topWordCount(col("_2")).as("top_n"),
        TextAnalysis.qualityBin(col("_2")).as("bin"))
    val q = scrub(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("scrubbed")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("scrubbed").orderBy("id").collect()
    val batch = scrub(docs.toDF()).orderBy("id").collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed(0).getAs[Long]("n_pii") == 2L)
    assert(streamed(0).getAs[String]("red").contains("<EMAIL>"))
    assert(streamed(0).getAs[String]("red").contains("<IP>"))
  }

  test("streaming JSONL source: quarantine semantics identical to the batch read") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl_stream_").toFile
    val lines = Seq(
      """{"doc_id": 1, "text": "good", "lang": "en"}""",
      """{"doc_id": 2, "text": "drifted"}""",
      """{"doc_id": 3, "text": "trunca""",
      """not json""",
      """null""")
    java.nio.file.Files.write(new java.io.File(dir, "part-0.jsonl").toPath,
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))

    val q = graft.sources.Jsonl.readStream(spark, dir.getAbsolutePath, schema)
      .writeStream.outputMode("append")
      .format("memory").queryName("jsonl_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("jsonl_stream")
    val batch = graft.sources.Jsonl.read(spark, dir.getAbsolutePath, schema)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(streamed) == canon(batch))
    // and the contract itself holds on the streamed side: 2 clean rows,
    // 3 quarantined (truncated JSON, non-JSON, and the null literal)
    assert(streamed.filter(col(graft.sources.Jsonl.CorruptCol).isNull).count() == 2L)
    assert(streamed.filter(col(graft.sources.Jsonl.CorruptCol).isNotNull).count() == 3L)
  }

  test("streaming dedupe drops repeated business keys") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      ev("2024-06-01 10:01:00", "a", 1.0),
      ev("2024-06-01 10:01:00", "a", 1.0), // dup
      ev("2024-06-01 10:02:00", "a", 2.0))
    val q = Streaming.dedupe(mem.toDF(), "ts", Seq("k"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").count() == 2)
  }

  test("streaming count-min sketch: micro-batched grid ≡ batch grid (mergeable agg)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData("a", "b", "a")
    val q = graft.llm.CountMin.sketch(mem.toDF().toDF("tok"), "tok", depth = 3, width = 64)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms")
      .start() // default trigger: keep running so the second batch folds in
    q.processAllAvailable()
    mem.addData("a", "c") // second micro-batch folds into the same grid
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cms").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.llm.CountMin.sketch(
        Seq("a", "b", "a", "a", "c").toDF("tok"), "tok", depth = 3, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("streaming HLL sketch: register table and estimate ≡ batch (max-mergeable agg)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    mem.addData(("g1", "x1"), ("g1", "x2"), ("g2", "x1"))
    val q = graft.operators.Hll.sketch(mem.toDF().toDF("g", "v"), Seq("g"), "v")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll")
      .start() // default trigger: keep running so the second batch folds in
    q.processAllAvailable()
    mem.addData(("g1", "x3"), ("g1", "x1")) // dup x1 must not move registers
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hll")
    val batch = graft.operators.Hll.sketch(
      Seq(("g1", "x1"), ("g1", "x2"), ("g2", "x1"), ("g1", "x3"), ("g1", "x1"))
        .toDF("g", "v"), Seq("g"), "v")
    val s = streamed.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val b = batch.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(s == b)
    val estS = graft.operators.Hll.estimate(streamed, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val estB = graft.operators.Hll.estimate(batch, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(estS == estB)
  }

  test("streaming SCD2: intervals close across micro-batches; batch law vs Scd.scd2") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    // (key, ts-micros-as-timestamp, attr) — version continuity must hold
    // across micro-batch boundaries (state carries the open run)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val q = Streaming.scd2Closed(mem.toDF().toDF("k", "ts", "attr"),
        "k", "ts", "attr")
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2s")
      .start()
    // batch 1: run 'a' opens, then 'b' closes it
    mem.addData((1L, t("2024-06-01 10:00:00"), "a"),
      (1L, t("2024-06-01 10:05:00"), "a"),
      (1L, t("2024-06-01 10:10:00"), "b"))
    q.processAllAvailable()
    val b1 = spark.table("scd2s").collect()
    assert(b1.length == 1)
    assert(b1(0).getAs[Int]("version") == 1 && b1(0).getAs[String]("attr") == "a")
    // batch 2: 'b' still open, survives the boundary; null closes it (a
    // NULL attribute is a tracked state, opening version 3)
    mem.addData((1L, t("2024-06-01 10:20:00"), "b"),
      (1L, t("2024-06-01 10:30:00"), null))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("scd2s").orderBy("version").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[Int]("version") == 2 &&
      rows(1).getAs[String]("attr") == "b" &&
      rows(1).getAs[Long]("valid_to_us") ==
        t("2024-06-01 10:30:00").getTime * 1000)

    // BATCH LAW: on a batch frame, scd2Closed == Scd.scd2 minus the open
    // (is_current) rows — the closed history is identical
    val df = Seq(
      (1L, t("2024-06-01 10:00:00"), "a"),
      (1L, t("2024-06-01 10:10:00"), "b"),
      (1L, t("2024-06-01 10:30:00"), null),
      (2L, t("2024-06-01 09:00:00"), "x")  // single open run: no closed rows
    ).toDF("k", "ts", "attr")
    val streamed = Streaming.scd2Closed(df, "k", "ts", "attr")
      .select(col("k"), col("version"), col("attr"),
        col("valid_from_us"), col("valid_to_us"))
    val batch = graft.operators.Scd.scd2(df, Seq("k"), "ts", Nil, "attr")
      .filter(col("valid_to").isNotNull)
      .select(col("k"), col("version"), col("attr"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(batch.count() == 2)
  }

  test("streaming SCD2 drops arrivals behind the applied frontier") {
    implicit val sql = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Streaming.scd2Closed(mem.toDF().toDF("k", "ts", "attr"),
        "k", "ts", "attr")
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2late")
      .start()
    mem.addData((1L, t("2024-06-01 10:00:00"), "a"),
      (1L, t("2024-06-01 10:10:00"), "b"))
    q.processAllAvailable()
    // a late 'c' OLDER than the applied frontier (10:10) must be dropped —
    // not open a version, not rewrite history
    mem.addData((1L, t("2024-06-01 10:05:00"), "c"),
      (1L, t("2024-06-01 10:20:00"), "d"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("scd2late").orderBy("version").collect()
    assert(rows.map(_.getAs[String]("attr")).toSeq == Seq("a", "b"))
    assert(rows.map(_.getAs[Int]("version")).toSeq == Seq(1, 2))
    // 'b' closed at d's ts (20), NOT at the late c's ts (05)
    assert(rows(1).getAs[Long]("valid_to_us") ==
      t("2024-06-01 10:20:00").getTime * 1000)
  }

  test("streaming sessionize: sessions close across micro-batches; batch law vs Sessionize") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val gap = 60L * 1000000 // 1 minute
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Streaming.sessionizeClosed(mem.toDF().toDF("user_id", "ts"),
        "user_id", "ts", gap)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess")
      .start()
    // batch 1: two events 30s apart — session stays OPEN (nothing emitted)
    mem.addData((1L, t("2024-06-01 10:00:00")), (1L, t("2024-06-01 10:00:30")))
    q.processAllAvailable()
    assert(spark.table("sess").count() == 0)
    // batch 2: a >gap event closes session 1 (2 events) and opens session 2;
    // the open run survived the micro-batch boundary in state
    mem.addData((1L, t("2024-06-01 10:05:00")))
    q.processAllAvailable()
    val s1 = spark.table("sess").collect()
    assert(s1.length == 1)
    assert(s1(0).getAs[Long]("session_idx") == 1 &&
      s1(0).getAs[Long]("n_events") == 2 &&
      s1(0).getAs[Long]("end_us") == t("2024-06-01 10:00:30").getTime * 1000)
    // batch 3: an EXACTLY-gap event continues session 2 (boundary law);
    // then a >gap one closes it with both events inside
    mem.addData((1L, t("2024-06-01 10:06:00")), (1L, t("2024-06-01 10:30:00")))
    q.processAllAvailable(); q.stop()
    val s2 = spark.table("sess").orderBy("session_idx").collect()
    assert(s2.length == 2)
    assert(s2(1).getAs[Long]("session_idx") == 2 &&
      s2(1).getAs[Long]("n_events") == 2)

    // BATCH LAW: on a batch frame, sessionizeClosed == sessionSummary
    // minus each entity's LAST (still-open) session
    val df = Seq(
      (1L, t("2024-06-01 10:00:00")), (1L, t("2024-06-01 10:00:30")),
      (1L, t("2024-06-01 10:05:00")), (1L, t("2024-06-01 10:30:00")),
      (2L, t("2024-06-01 09:00:00")) // single open session: no closed rows
    ).toDF("user_id", "ts")
    val streamed = Streaming.sessionizeClosed(df, "user_id", "ts", gap)
      .select("user_id", "session_idx", "n_events", "start_us", "end_us")
      .collect().map(_.toSeq).toSet
    val summary = graft.operators.Sessionize
      .sessionSummary(df, "user_id", "ts", gap, tieCols = Nil)
    val open = summary.groupBy(col("user_id"))
      .agg(max(col("session_idx")).as("session_idx"))
    val closed = summary.join(open, Seq("user_id", "session_idx"), "left_anti")
      .select("user_id", "session_idx", "n_events", "start_us", "end_us")
      .collect().map(_.toSeq).toSet
    assert(streamed == closed && streamed.nonEmpty)
  }

  test("streaming cusum monitor: alarms across micro-batches; batch law vs Drift.cusumAlarms") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // μ=10, k=0, h=5: alarms need a cumulative drift of ≥ 5 in a direction
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = Streaming.cusumMonitor(mem.toDF().toDF("user_id", "ts", "v"),
        "user_id", "ts", "v", refMean = 10.0, slack = 0.0, threshold = 5.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_mon")
      .start()
    // batch 1: +3 then −1 drift — no alarm yet, state carries g⁺ = 2
    mem.addData((1L, t("2024-06-01 10:00:00"), 13.0),
      (1L, t("2024-06-01 10:01:00"), 9.0))
    q.processAllAvailable()
    assert(spark.table("cusum_mon").count() == 0)
    // batch 2: +4 crosses h=5 at g⁺ = 6 — the alarm survives the
    // micro-batch boundary in state
    mem.addData((1L, t("2024-06-01 10:02:00"), 14.0))
    q.processAllAvailable()
    val a1 = spark.table("cusum_mon").collect()
    assert(a1.length == 1)
    assert(a1(0).getAs[String]("direction") == "up" &&
      a1(0).getAs[Long]("alarm_idx") == 3L &&
      a1(0).getAs[Long]("stat4") == 60000L)
    // batch 3: further up-crossings do NOT re-fire (first-alarm contract);
    // a deep down-swing fires the other direction once
    mem.addData((1L, t("2024-06-01 10:03:00"), 20.0),
      (1L, t("2024-06-01 10:04:00"), 0.0), (1L, t("2024-06-01 10:05:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val a2 = spark.table("cusum_mon").orderBy("direction").collect()
    assert(a2.length == 2)
    assert(a2(0).getAs[String]("direction") == "down")

    // BATCH LAW: on a batch frame, cusumMonitor ≡ Drift.cusumAlarms
    // (unique per-entity timestamps = the batch tie contract)
    val rnd = new scala.util.Random(99L)
    val df = (1 to 400).map { i =>
      (i % 5L,
        new java.sql.Timestamp(t("2024-06-01 10:00:00").getTime + i * 60000L),
        math.floor(rnd.nextDouble() * 2000 + 0.5) / 100.0)
    }.toDF("user_id", "ts", "v")
    val streamed = Streaming.cusumMonitor(df, "user_id", "ts", "v",
        refMean = 9.0, slack = 0.5, threshold = 20.0)
      .select(col("user_id"), col("direction"), col("alarm_idx"),
        col("alarm_us"), col("stat4"))
      .collect().map(_.toSeq).toSet
    val batch = graft.llm.Drift.cusumAlarms(df, Seq("user_id"),
        orderCol = col("ts"), valueCol = col("v"), tieCols = Seq(col("ts")),
        refMean = 9.0, slack = 0.5, threshold = 20.0)
      .select(col("user_id"), col("direction"), col("alarm_idx"),
        unix_micros(col("alarm_order").cast("timestamp")).as("alarm_us"),
        col("stat4"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"law broke: streamed=$streamed batch=$batch")
  }

  test("streaming ewma monitor: ring state across micro-batches; batch law vs Smooth.ewma") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = Streaming.ewmaMonitor(mem.toDF().toDF("user_id", "ts", "v"),
        "user_id", "ts", "v", alpha = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_mon")
      .start()
    // α = 0.5, x = [2, 4]: z₁ = 2, z₂ = 10/3
    mem.addData((1L, t("2024-06-01 10:00:00"), 2.0),
      (1L, t("2024-06-01 10:01:00"), 4.0))
    q.processAllAvailable()
    // batch 2: the ring carries across the micro-batch boundary → z₃ = 34/7
    mem.addData((1L, t("2024-06-01 10:02:00"), 6.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ewma_mon").orderBy("idx").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Double]("ewma") == 2.0)
    assert(math.abs(got(1).getAs[Double]("ewma") - 10.0 / 3) < 1e-9)
    assert(math.abs(got(2).getAs[Double]("ewma") - 34.0 / 7) < 1e-9)

    // BATCH LAW: on a batch frame (unique per-entity timestamps),
    // ewmaMonitor ≡ Smooth.ewma — same taps, same num/den, same division
    val rnd = new scala.util.Random(7L)
    val df = (1 to 300).map { i =>
      (i % 4L,
        new java.sql.Timestamp(t("2024-06-01 10:00:00").getTime + i * 60000L),
        math.floor(rnd.nextDouble() * 2000 + 0.5) / 100.0)
    }.toDF("user_id", "ts", "v")
    val streamed = Streaming.ewmaMonitor(df, "user_id", "ts", "v", alpha = 0.3)
      .select(col("user_id"), col("idx"), col("ts_us"), col("ewma"))
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.Smooth.ewma(df, Seq("user_id"),
        orderCol = unix_micros(col("ts")), orderOut = "ts_us",
        valueCol = col("v"), tieCols = Seq.empty, alpha = 0.3)
      .select(col("user_id"), col("idx"), col("ts_us"), col("ewma"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"law broke: ${streamed.size} streamed vs ${batch.size} batch rows")
  }

  test("streaming psi monitor: windows close under watermark; batch law vs psiAgainstBaseline") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, date_trunc}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = Streaming.psiMonitor(mem.toDF().toDF("ts", "v"), "ts", "v",
        mn = 0.0, mx = 10.0, bins = 2, baseline = Seq(0.5, 0.5),
        windowDur = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("psi_mon").start()
    // window 1 balanced (psi8 = 0), window 2 skewed low
    mem.addData((t("2024-06-01 10:01:00"), 1.0), (t("2024-06-01 10:02:00"), 9.0),
      (t("2024-06-01 10:11:00"), 1.0), (t("2024-06-01 10:12:00"), 1.0),
      (t("2024-06-01 10:13:00"), 2.0))
    q.processAllAvailable()
    // watermark reached 10:13 → window 1 (ending 10:10) already closed
    assert(spark.table("psi_mon").count() == 1)
    mem.addData((t("2024-06-01 10:31:00"), 5.0)) // watermark passes window 2
    q.processAllAvailable(); q.stop()
    val got = spark.table("psi_mon").orderBy("window_start").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("psi8") == 0L)
    val t0 = math.floor((0.8 - 0.5) * math.log(0.8 / 0.5) * 1e8 + 0.5).toLong
    val t1 = math.floor((0.2 - 0.5) * math.log(0.2 / 0.5) * 1e8 + 0.5).toLong
    assert(got(1).getAs[Long]("psi8") == t0 + t1)
    assert(got(1).getAs[Long]("n") == 3L)

    // BATCH LAW: psiMonitor on a batch frame ≡ psiAgainstBaseline per day
    val rnd = new scala.util.Random(13L)
    val df = (1 to 500).map { i =>
      (new java.sql.Timestamp(t("2024-06-01 00:00:00").getTime + i * 600000L),
        rnd.nextDouble() * 120 - 10) // excursions beyond [0, 100) clamp
    }.toDF("ts", "v")
    val streamed = Streaming.psiMonitor(df, "ts", "v", 0.0, 100.0, 10,
        Seq.fill(10)(0.1), "1 day")
      .select(col("window_start"), col("n"), col("psi8"))
      .collect().map(_.toSeq).toSet
    val batch = graft.llm.Drift.psiAgainstBaseline(
        df.withColumn("day", date_trunc("day", col("ts"))), Seq("day"),
        col("v"), 0.0, 100.0, 10, Seq.fill(10)(0.1))
      .select(col("day"), col("n"), col("psi8"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"law broke: streamed=${streamed.size} batch=${batch.size}")
  }

  test("streaming concurrency monitor: record highs across micro-batches; batch law vs maxConcurrent") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, unix_micros, when}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = Streaming.concurrencyMonitor(mem.toDF().toDF("g", "ts", "d"),
        "g", "ts", "d")
      .writeStream.outputMode("append")
      .format("memory").queryName("conc_mon").start()
    mem.addData((1L, t("2024-06-01 10:00:00"), 1L),
      (1L, t("2024-06-01 10:01:00"), 1L))
    q.processAllAvailable()
    assert(spark.table("conc_mon").count() == 2) // highs at 1 and 2
    // dip and recover to the SAME level: no emission; then a new high
    mem.addData((1L, t("2024-06-01 10:02:00"), -1L),
      (1L, t("2024-06-01 10:03:00"), 1L), (1L, t("2024-06-01 10:04:00"), 1L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("conc_mon").orderBy("t_us").collect()
    assert(got.map(_.getAs[Long]("peak")).toSeq == Seq(1L, 2L, 3L))

    // BATCH LAW: last record high ≡ Concurrency.maxConcurrent peak/peak_at
    // (distinct timestamps = the tie contract)
    val rnd = new scala.util.Random(31L)
    val iv = (1 to 300).map { i =>
      val s = i * 1000L + rnd.nextInt(500)
      (i % 3L, s, s + 1000L + rnd.nextInt(40000))
    }.toDF("g", "s", "e")
    val ev = iv.select(col("g"), col("s").as("tt"), lit(1L).as("d"))
      .unionAll(iv.select(col("g"), col("e").as("tt"), lit(-1L).as("d")))
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(col("tt")))
    val lastHigh = Streaming.concurrencyMonitor(ev, "g", "ts", "d")
      .groupBy(col("g"))
      .agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct(col("t_us"), col("peak")),
        col("peak")).as("m"))
      .select(col("g"), col("m.t_us").as("peak_at"), col("m.peak").as("peak"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.operators.Concurrency.maxConcurrent(iv, Seq("g"),
        col("s"), col("e"))
      .collect().map(r => r.getAs[Long]("g") ->
        (r.getAs[Long]("peak_at"), r.getAs[Long]("peak"))).toMap
    assert(lastHigh == batch && batch.nonEmpty,
      s"law broke: streamed=$lastHigh batch=$batch")
  }

  test("streaming sessionize: string entity keys keep per-entity state; bad key type fails loudly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val gap = 60L * 1000000
    // a string user id must NOT collapse into one state group (the
    // cast-to-long-under-non-ANSI trap): two interleaved entities, each
    // with its own closed session
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val q = Streaming.sessionizeClosed(mem.toDF().toDF("user_id", "ts"),
        "user_id", "ts", gap)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_str")
      .start()
    mem.addData(
      ("alice", t("2024-06-01 10:00:00")), ("bob", t("2024-06-01 10:00:10")),
      ("alice", t("2024-06-01 10:00:30")), ("bob", t("2024-06-01 10:00:40")))
    q.processAllAvailable()
    mem.addData(("alice", t("2024-06-01 10:05:00")),
      ("bob", t("2024-06-01 10:05:00")))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_str").collect()
    assert(rows.length == 2, "one closed session per string entity")
    assert(rows.map(_.getAs[String]("user_id")).toSet == Set("alice", "bob"))
    assert(rows.forall(_.getAs[Long]("n_events") == 2))
    // unsupported key type: loud contract error, not silent collapse
    val bad = Seq((Array(1.toByte), t("2024-06-01 10:00:00")))
      .toDF("user_id", "ts")
    val boom = intercept[IllegalArgumentException] {
      Streaming.sessionizeClosed(bad, "user_id", "ts", gap)
    }
    assert(boom.getMessage.contains("unsupported key type"))
  }
}
