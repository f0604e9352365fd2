package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.EventStreams.SEvent

/** MemoryStream-driven specs for the streaming stretch (SURVEY.md §7):
  * tumbling windows close at the watermark, late data is dropped,
  * session windows merge by gap, custom keyed state accumulates. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def ev(id: Long, t: String, user: Long = 1L,
                 typ: String = "click", v: Double = 1.0): SEvent =
    SEvent(id, ts(t), user, typ, v)

  private def drain(q: StreamingQuery): Unit = q.processAllAvailable()

  test("tumbling windows emit on close; late data past watermark dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(EventStreams.TumblingMode).start()
    try {
      in.addData(ev(1, "10:05"), ev(2, "10:25"), ev(3, "10:55", v = 2.0))
      drain(q)
      // nothing closed yet (watermark still at epoch)
      assert(spark.table("tumbling").count() == 0)
      // an event far ahead advances the watermark past 11:00 → the
      // 10:00 window closes with all three rows
      in.addData(ev(4, "14:30"))
      drain(q)
      val closed = spark.table("tumbling")
        .selectExpr("cast(ws as string)", "cnt", "sum_val").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(closed == Set(("2024-01-01 10:00:00", 3L, 4.0)))
      // a late event inside the already-closed window is dropped
      in.addData(ev(5, "10:40"), ev(6, "18:30"))
      drain(q)
      val after = spark.table("tumbling")
        .selectExpr("cast(ws as string)", "cnt").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(after("2024-01-01 10:00:00") == 3L) // unchanged: late row dropped
      assert(after("2024-01-01 14:00:00") == 1L)
    } finally q.stop()
  }

  test("session windows merge events within the 30-min gap per user") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.sessionCounts(in.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(EventStreams.SessionMode).start()
    try {
      // user 1: 10:00,10:20,10:45 chain into one session (gaps < 30 min);
      // 12:00 starts a second. user 2: one singleton.
      in.addData(ev(1, "10:00"), ev(2, "10:20"), ev(3, "10:45"),
        ev(4, "12:00"), ev(5, "10:10", user = 2L))
      drain(q)
      in.addData(ev(9, "20:00")) // advance watermark, close everything
      drain(q)
      val got = spark.table("sessions")
        .selectExpr("user_id", "cast(ss as string)", "cast(se as string)", "cnt")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(got.contains(
        (1L, "2024-01-01 10:00:00", "2024-01-01 11:15:00", 3L)))
      assert(got.contains(
        (1L, "2024-01-01 12:00:00", "2024-01-01 12:30:00", 1L)))
      assert(got.contains(
        (2L, "2024-01-01 10:10:00", "2024-01-01 10:40:00", 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits a session when its event-time " +
    "timeout fires, then evicts the state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.closedSessions(in.toDS())
      .writeStream.format("memory").queryName("closed")
      .outputMode(EventStreams.ClosedSessionsMode).start()
    try {
      in.addData(ev(1, "10:00"), ev(2, "10:10"), ev(3, "10:20"))
      drain(q)
      assert(spark.table("closed").count() == 0) // session still open
      // far-future events from OTHER users advance the watermark
      // (= max ts - 2 h) past 10:50; the next batch's timeout check
      // then fires for user 1's open session and emits it
      in.addData(ev(4, "23:00", user = 99L))
      drain(q)
      in.addData(ev(5, "23:05", user = 98L))
      drain(q)
      val got = spark.table("closed").as[EventStreams.ClosedSession]
        .collect().toSeq
      assert(got.map(s => (s.user_id, s.n_events)).contains((1L, 3L)))
      val s = got.find(_.n_events == 3L).get
      assert(s.start_ms == ts("10:00").getTime && s.end_ms == ts("10:20").getTime)
    } finally q.stop()
  }

  test("flatMapGroupsWithState splits on a >30-min gap inside one batch " +
    "(no timeout needed)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.closedSessions(in.toDS())
      .writeStream.format("memory").queryName("gapsplit")
      .outputMode(EventStreams.ClosedSessionsMode).start()
    try {
      // 10:00-10:10 then 13:00 in the SAME batch: the 2h50m gap closes
      // the first session immediately, before any timeout fires
      in.addData(ev(1, "10:00"), ev(2, "10:10"), ev(3, "13:00"))
      drain(q)
      val got = spark.table("gapsplit").as[EventStreams.ClosedSession]
        .collect().toSeq
      assert(got.map(s => (s.start_ms, s.end_ms, s.n_events)) ==
        Seq((ts("10:00").getTime, ts("10:10").getTime, 2L)))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user running aggregates " +
    "across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.runningUserCounts(in.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(EventStreams.RunningMode).start()
    try {
      in.addData(ev(1, "10:00", user = 1, typ = "a", v = 1.5),
        ev(2, "10:10", user = 1, typ = "b", v = 2.5),
        ev(3, "10:05", user = 2, typ = "c", v = 10.0))
      drain(q)
      in.addData(ev(4, "11:00", user = 1, typ = "d", v = 6.0))
      drain(q)
      // memory sink in update mode appends updated rows; take the latest
      // per user
      val latest = spark.table("running").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getString(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(latest(1L) == ((3L, 10.0, "d")))
      assert(latest(2L) == ((1L, 10.0, "c")))
    } finally q.stop()
  }

  test("idle users are evicted by the event-time timeout: the next event " +
    "reopens the profile from zero") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    // 1-hour idle timeout for the test (default is 4 h)
    val q = EventStreams.runningUserCounts(in.toDS(), idleMs = 3600L * 1000)
      .writeStream.format("memory").queryName("evict")
      .outputMode(EventStreams.RunningMode).start()
    try {
      in.addData(ev(1, "10:00", user = 1, v = 1.0),
        ev(2, "10:10", user = 1, v = 2.0))
      drain(q)
      // two far-future events advance the watermark (= max ts - 2 h) past
      // 11:10 (= last event + idle); the second batch fires the timeout
      in.addData(ev(3, "23:00", user = 9L))
      drain(q)
      in.addData(ev(4, "23:05", user = 8L))
      drain(q)
      // user 1 returns: state was evicted, so the profile restarts at 1
      // (without eviction this would be (3, 10.0))
      in.addData(ev(5, "23:10", user = 1, v = 7.0))
      drain(q)
      val user1 = spark.table("evict").collect()
        .filter(_.getLong(0) == 1L)
        .map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(user1 == Set((2L, 3.0), (1L, 7.0)))
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence per event_id; state is " +
    "watermark-bounded (a stale id re-admits after eviction)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.dedupedEvents(in.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(EventStreams.DedupMode).start()
    try {
      // id 1 twice in one batch, id 2 once
      in.addData(ev(1, "10:00", v = 1.0), ev(1, "10:00", v = 1.0),
        ev(2, "10:10"))
      drain(q)
      // id 1 again in a later batch, still within the watermark → dropped
      in.addData(ev(1, "10:30"))
      drain(q)
      assert(spark.table("dedup").select("event_id").as[Long].collect()
        .toSeq.sorted == Seq(1L, 2L))
      // advance the watermark far past id 1's state, then send id 1 again:
      // its dedup state was evicted, so it re-admits (documented contract —
      // watermark-bounded, not unbounded-lookback)
      in.addData(ev(9, "23:00", user = 9L))
      drain(q)
      in.addData(ev(1, "23:05"))
      drain(q)
      val ones = spark.table("dedup").filter($"event_id" === 1L).count()
      assert(ones == 2L)
    } finally q.stop()
  }

  test("RocksDB state store: running aggregates survive a query restart " +
    "from the checkpoint") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("rocksdb-ckpt-").toString
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[SEvent]
      val seen = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]
      def start() = EventStreams.runningUserCounts(in.toDS())
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[EventStreams.UserAgg],
                         _: Long) =>
          val rows = df.collect()
          seen.synchronized {
            seen ++= rows.map(a => (a.user_id, a.n_events, a.sum_value))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(EventStreams.RunningMode).start()
      val q1 = start()
      in.addData(ev(1, "10:00", user = 1, v = 1.0),
        ev(2, "10:10", user = 1, v = 2.0))
      drain(q1)
      q1.stop()
      // restart from the same checkpoint: state (n=2, sum=3.0) must be
      // recovered from the RocksDB store, not rebuilt from zero
      val q2 = start()
      try {
        in.addData(ev(3, "10:20", user = 1, v = 4.0))
        drain(q2)
        val latest = seen.synchronized {
          seen.filter(_._1 == 1L).map(a => (a._2, a._3)).maxBy(_._1)
        }
        assert(latest == ((3L, 7.0)))
      } finally q2.stop()
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-stream interval join attributes purchases to prior clicks " +
    "within the hour; out-of-window and cross-user pairs never match") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.attributedPurchases(in.toDF())
      .writeStream.format("memory").queryName("attribution")
      .outputMode(EventStreams.AttributionMode).start()
    try {
      in.addData(
        ev(1, "10:00", user = 1, typ = "click"),
        ev(2, "10:40", user = 1, typ = "purchase", v = 9.0), // ← click 1 (40m)
        ev(3, "09:30", user = 2, typ = "click"),
        ev(4, "11:30", user = 2, typ = "purchase", v = 5.0), // 2h after: no match
        ev(5, "10:30", user = 3, typ = "purchase", v = 7.0)) // other-user click only
      drain(q)
      // advance both watermarks far enough to finalize the joins
      in.addData(ev(6, "20:00", user = 9, typ = "click"),
        ev(7, "20:00", user = 9, typ = "purchase"))
      drain(q)
      val rows = spark.table("attribution")
        .select("purchase_id", "click_id", "value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((2L, 1L, 9.0)))      // in-window same-user pair
      assert(rows.contains((7L, 6L, 1.0)))      // zero-delay pair
      assert(!rows.exists(_._1 == 4L))          // outside the 1h window
      assert(!rows.exists(_._1 == 5L))          // no same-user click
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unattributed purchases with " +
    "null click columns only once both watermarks prove finality") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.attributionAudit(in.toDF())
      .writeStream.format("memory").queryName("attribution_audit")
      .outputMode(EventStreams.AttributionAuditMode).start()
    try {
      in.addData(
        ev(1, "10:00", user = 1, typ = "click"),
        ev(2, "10:40", user = 1, typ = "purchase", v = 9.0), // matched
        ev(3, "10:30", user = 3, typ = "purchase", v = 7.0)) // no click ever
      drain(q)
      // the unmatched purchase must NOT have emitted yet — a click for
      // user 3 could still arrive within its 1-hour lookback
      val early = spark.table("attribution_audit")
        .select("purchase_id").collect().map(_.getLong(0)).toSet
      assert(!early.contains(3L),
        "outer row emitted before the watermark proved no click can match")
      // advance BOTH sides' watermarks (each side only sees its own
      // event type) far past 10:30 + lookback + the 2h delay...
      in.addData(ev(10, "20:00", user = 9, typ = "click"),
        ev(11, "20:00", user = 9, typ = "purchase"))
      drain(q)
      // ...and give the engine one more batch to evict + emit
      in.addData(ev(12, "23:00", user = 9, typ = "click"),
        ev(13, "23:00", user = 9, typ = "purchase"))
      drain(q)
      val rows = spark.table("attribution_audit")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      assert(rows.contains((2L, Some(1L))))  // matched pair, no null twin
      assert(!rows.contains((2L, None)))
      assert(rows.contains((3L, None)))      // audit row: provably unattributed
    } finally q.stop()
  }

  test("stream-static enrichment joins each event to the broadcast " +
    "dimension; unknown users keep a sentinel instead of dropping") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "free"), (2L, "paid")).toDF("user_id", "segment")
    val in = MemoryStream[SEvent]
    val q = EventStreams.enrichedEvents(in.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(EventStreams.EnrichedMode).start()
    try {
      in.addData(ev(1, "10:05", user = 1), ev(2, "10:06", user = 2),
        ev(3, "10:07", user = 99))
      drain(q)
      val rows = spark.table("enriched")
        .select("event_id", "segment").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "free"), (2L, "paid"), (3L, "unknown")))
    } finally q.stop()
  }
}
