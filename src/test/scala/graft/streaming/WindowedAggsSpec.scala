package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class WindowedAggsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window counts close when the watermark passes (append mode)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = WindowedAggs.tumblingCounts(
      in.toDF().toDF("ts", "user_id"), "ts", "user_id",
      windowLength = "10 minutes", watermarkDelay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    // batch 1: events in the 10:00 window; batch 2 advances event time far
    // past it; batch 3 runs with the advanced watermark and emits the window
    in.addData((ts(1), 1L), (ts(2), 1L), (ts(8), 2L)); q.processAllAvailable()
    in.addData((ts(25), 3L)); q.processAllAvailable()
    in.addData((ts(26), 3L)); q.processAllAvailable()
    q.stop()

    val out = spark.table("tumbling").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[Long]("user_id"),
        r.getAs[Long]("events"))).toSet
    out should contain(("2024-01-01 10:00:00.0", 1L, 2L))
    out should contain(("2024-01-01 10:00:00.0", 2L, 1L))
    // the 10:20 window is still open -> not emitted
    out.map(_._1) should not contain "2024-01-01 10:20:00.0"
  }

  test("stream-stream join attributes clicks to impressions within the bound") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val impressions = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = WindowedAggs.streamStreamJoin(
      clicks.toDF().toDF("click_ts", "c_ad"),
      impressions.toDF().toDF("imp_ts", "i_ad", "campaign"),
      leftKey = "c_ad", rightKey = "i_ad",
      leftTs = "click_ts", rightTs = "imp_ts",
      within = "10 minutes", watermarkDelay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    impressions.addData((ts(0), 1L, "camp_a"), (ts(1), 2L, "camp_b"))
    clicks.addData((ts(4), 1L))   // 4 min after ad 1's impression -> attributed
    clicks.addData((ts(15), 2L))  // 14 min after ad 2's impression -> outside bound
    clicks.addData((ts(2), 3L))   // no impression for ad 3 -> no row
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attrib").collect()
      .map(r => (r.getAs[Long]("c_ad"), r.getAs[String]("campaign"))).toSet
    out shouldBe Set((1L, "camp_a"))
  }

  test("streaming dedup drops in-watermark duplicates with bounded state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val deduped = WindowedAggs.streamingDedup(
      in.toDF().toDF("ts", "event_id", "payload"),
      keyCols = Seq("event_id"), tsCol = "ts", watermarkDelay = "5 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    // duplicate event_id 1 within the watermark window -> one survivor
    in.addData((ts(1), 1L, "a"), (ts(2), 1L, "a-dup"), (ts(3), 2L, "b"))
    q.processAllAvailable()
    in.addData((ts(4), 2L, "b-dup")); q.processAllAvailable()
    q.stop()
    val rows = spark.table("sdedup").collect()
    rows.map(_.getAs[Long]("event_id")).sorted shouldBe Array(1L, 2L)
  }

  test("built-in session windows merge gapped events and close on watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val sessions = WindowedAggs.sessionWindowCounts(
      in.toDF().toDF("ts", "user_id"), "ts", "user_id",
      gap = "5 minutes", watermarkDelay = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("swin")
      .outputMode("append").start()
    // user 1: events at 10:00/10:02/10:04 chain into ONE session ending
    // 10:09; user 2's 10:03 event is its own session. A later batch far
    // past both advances the watermark so the closed sessions emit.
    in.addData((ts(0), 1L), (ts(2), 1L), (ts(4), 1L), (ts(3), 2L))
    q.processAllAvailable()
    in.addData((ts(40), 3L)); q.processAllAvailable()
    in.addData((ts(55), 3L)); q.processAllAvailable()
    q.stop()

    val out = spark.table("swin").collect()
      .map(r => (r.getAs[Timestamp]("session_start").toString,
        r.getAs[Timestamp]("session_end").toString,
        r.getAs[Long]("user_id"), r.getAs[Long]("events"))).toSet
    out should contain(("2024-01-01 10:00:00.0", "2024-01-01 10:09:00.0", 1L, 3L))
    out should contain(("2024-01-01 10:03:00.0", "2024-01-01 10:08:00.0", 2L, 1L))
  }

  test("sessionization closes a session after the inactivity gap") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[WindowedAggs.SessionEvent]
    val sessions = WindowedAggs.sessionize(in.toDS(),
      gapSeconds = 300, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // batch 1: user 1's two events (one session). batch 2 advances the
    // watermark; batch 3 runs with it past user 1's timeout -> summary out.
    in.addData(
      WindowedAggs.SessionEvent(1L, ts(0), "view"),
      WindowedAggs.SessionEvent(1L, ts(2), "click"))
    q.processAllAvailable()
    in.addData(WindowedAggs.SessionEvent(2L, ts(40), "view")); q.processAllAvailable()
    in.addData(WindowedAggs.SessionEvent(2L, ts(55), "view")); q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions")
      .as[WindowedAggs.SessionSummary].collect().filter(_.user_id == 1L)
    out.length shouldBe 1
    out.head.events shouldBe 2
    out.head.duration_sec shouldBe 120
  }

  test("in-batch gap splits into separate sessions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[WindowedAggs.SessionEvent]
    val sessions = WindowedAggs.sessionize(in.toDS(),
      gapSeconds = 300, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    // one batch containing two bursts separated by >5 minutes: the first
    // burst closes inside the batch, the second stays open
    in.addData(
      WindowedAggs.SessionEvent(7L, ts(0), "a"),
      WindowedAggs.SessionEvent(7L, ts(1), "b"),
      WindowedAggs.SessionEvent(7L, ts(20), "c"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions2")
      .as[WindowedAggs.SessionSummary].collect().filter(_.user_id == 7L)
    out.length shouldBe 1
    out.head.events shouldBe 2
    out.head.session_start shouldBe ts(0)
  }
}
