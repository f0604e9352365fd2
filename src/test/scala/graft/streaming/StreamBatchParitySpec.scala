package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr, length, lit, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.EventStreams.SEvent

/** Batch-equivalence harness for the streaming transforms — the
  * oracle-grade signal streaming otherwise lacks (no DuckDB oracle can
  * drive a watermarked unbounded query): the SAME transform runs once
  * through MemoryStream micro-batches (state, watermarks, incremental
  * emission) and once as a plain batch DataFrame over the SAME rows
  * (where `withWatermark` is a no-op and `session_window` / the interval
  * join evaluate classically), and the collected results must be equal.
  *
  * Events are fed to the stream in event-time order split across several
  * micro-batches, so nothing is watermark-dropped and the parity claim
  * is exact. Trailing sentinel batches (user 999, far future) advance
  * the watermark to flush append-mode state; the sentinel's own rows are
  * excluded from both sides.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val base = Timestamp.valueOf("2024-03-01 08:00:00").getTime

  /** ~60 deterministic pseudo-random events over 5 users / 10 hours.
    * Values are multiples of 0.25 (exactly representable), so the
    * incremental streaming sum and the batch sum agree bit-for-bit in
    * any accumulation order. */
  private lazy val fixture: Seq[SEvent] = {
    val rnd = new scala.util.Random(5)
    val types = Vector("view", "click", "purchase")
    (0 until 60).map { i =>
      SEvent(i.toLong,
        new Timestamp(base + rnd.nextInt(600).toLong * 60 * 1000),
        (rnd.nextInt(5) + 1).toLong,
        types(rnd.nextInt(3)),
        (rnd.nextInt(8) + 1) * 0.25)
    }.sortBy(e => (e.ts.getTime, e.event_id))
  }

  private def sentinel(id: Long, plusMin: Long): SEvent =
    SEvent(id, new Timestamp(base + (600 + plusMin) * 60 * 1000),
      999L, "view", 0.25)

  /** Runs `transform` through MemoryStream in 3 event-time-ordered
    * micro-batches plus 2 watermark-flushing sentinel batches; returns
    * the memory-sink rows (sentinel user excluded by the caller). */
  private def streamed(name: String,
                       transform: org.apache.spark.sql.DataFrame =>
                         org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = transform(in.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      fixture.grouped(20).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
      // two sentinel batches: the first advances the watermark from its
      // data, the SECOND gives the engine a batch in which that new
      // watermark evicts/emits closed state
      in.addData(sentinel(1000, 600)); q.processAllAvailable()
      in.addData(sentinel(1001, 605)); q.processAllAvailable()
      spark.table(name)
    } finally q.stop()
  }

  test("sliding (hopping) counts: streaming equals batch equals the " +
    "q169 integer-offset formulation on the same rows") {
    import spark.implicits._
    val got = streamed("parity_sliding", EventStreams.slidingCounts)
      .selectExpr("cast(ws as string)", "event_type", "cnt", "sum_val")
      .collect().map(_.toSeq).toSet
    // the sentinels sit 600+ minutes past the last fixture event — far
    // beyond the 1 h window length — so they share no window with the
    // fixture; their watermark (sentinel ts − 2 h) closes EVERY fixture
    // window while their own windows stay open. Expected = the batch
    // evaluation over the fixture alone, exactly.
    val all = fixture :+ sentinel(1000, 600) :+ sentinel(1001, 605)
    val want = EventStreams.slidingCounts(fixture.toDF())
      .selectExpr("cast(ws as string)", "event_type", "cnt", "sum_val")
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"stream/batch divergence: ${(got diff want).take(3)} / ${(want diff got).take(3)}")

    // independent cross-check of the window arithmetic itself: the q169
    // µs-integer explode over the same rows must reproduce the batch
    // evaluation of Spark's window() exactly
    val batchAll = EventStreams.slidingCounts(all.toDF())
      .selectExpr("cast(ws as string)", "event_type", "cnt", "sum_val")
      .collect().map(_.toSeq).toSet
    val f = org.apache.spark.sql.functions
    val q169Style = all.toDF()
      .selectExpr("cast(ts as long) * 1000000 as tus", "event_type",
        "value")
      .withColumn("k", f.explode(f.expr("sequence(0, 3)")))
      .selectExpr("((tus div 900000000) - k) * 900000000 as ws_us",
        "event_type", "value")
      .groupBy("ws_us", "event_type")
      .agg(f.count(f.lit(1)).as("cnt"),
        f.round(f.sum("value"), 4).as("sum_val"))
      .selectExpr("cast(timestamp_micros(ws_us) as string)", "event_type",
        "cnt", "sum_val")
      .collect().map(_.toSeq).toSet
    assert(q169Style == batchAll)
  }

  test("session_window counts: streaming equals batch on the same rows") {
    import spark.implicits._
    val got = streamed("parity_sessions", EventStreams.sessionCounts)
      .filter("user_id <> 999")
      .selectExpr("cast(ss as string)", "cast(se as string)", "user_id",
        "cnt", "sum_val")
      .collect().map(_.toSeq).toSet
    val want = EventStreams.sessionCounts(fixture.toDF())
      .selectExpr("cast(ss as string)", "cast(se as string)", "user_id",
        "cnt", "sum_val")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  /** Drives [[EventStreams.closedSessions]] (the flatMapGroupsWithState
    * custom-state path) through MemoryStream micro-batches. */
  private def streamedSessions(name: String,
                               batches: Seq[Seq[SEvent]]) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.closedSessions(in.toDS()).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { chunk => in.addData(chunk); q.processAllAvailable() }
      spark.table(name)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: streaming equals the " +
    "batch q81 lag+cumsum formulation on the same rows") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val batches = fixture.grouped(20).toSeq ++
      Seq(Seq(sentinel(1000, 600)), Seq(sentinel(1001, 605)))
    val got = streamedSessions("parity_closed", batches)
      .filter("user_id <> 999")
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(_.toSeq).toSet
    // independent batch formulation — q81's lag + cumulative-sum session
    // ids, not the streaming code path
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = fixture.toDF()
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        unix_millis(col("ts")) - unix_millis(col("prev")) >
          30L * 60 * 1000, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(wRun))
      .groupBy("user_id", "sid")
      .agg(min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("closedSessions late data: a sub-watermark event is dropped, the " +
    "timed-out session is emitted once, and its state is evicted") {
    def ev(id: Long, user: Long, min: Long) =
      SEvent(id, new Timestamp(base + min * 60 * 1000), user, "view", 0.25)
    // batch 1: user 1's session (t = 0..10 min, 3 events) plus a far-
    // future user-2 event that drags the watermark to 500 - 120 min
    val b1 = Seq(ev(1, 1, 0), ev(2, 1, 5), ev(3, 1, 10), ev(4, 2, 500))
    // batch 2: a LATE user-1 event at t = 50 min — far below the 380 min
    // watermark, so it must be dropped, not reopen/extend the session;
    // the same batch's watermark fires user 1's 10+30 min timeout
    val b2 = Seq(ev(5, 1, 50))
    // batch 3: user 1 returns at t = 600 — state was evicted, so this is
    // a FRESH session of one event, not a continuation
    val b3 = Seq(ev(6, 1, 600))
    // sentinels push the watermark past 600 + 30 to flush the new session
    val b4 = Seq(ev(1000, 999, 800))
    val b5 = Seq(ev(1001, 999, 805))
    val out = streamedSessions("parity_late", Seq(b1, b2, b3, b4, b5))
      .filter("user_id = 1")
      .select("start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    def ms(min: Long) = base + min * 60 * 1000
    assert(out.toSeq == Seq(
      (ms(0), ms(10), 3L),   // closed by timeout; late event NOT included
      (ms(600), ms(600), 1L) // fresh session after eviction
    ), s"got: ${out.toSeq}")
  }

  test("stream-stream interval attribution join: streaming equals batch " +
    "on the same rows") {
    import spark.implicits._
    val cols = Seq("user_id", "purchase_id", "click_id", "cast(p_ts as string)",
      "cast(c_ts as string)", "value")
    val got = streamed("parity_attrib", EventStreams.attributedPurchases)
      .filter("user_id <> 999")
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    val want = EventStreams.attributedPurchases(fixture.toDF())
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture produced no click->purchase pairs")
  }

  test("left-outer stream-stream attribution audit: streaming equals " +
    "batch, including the null-padded unattributed purchases") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val cols = Seq("user_id", "purchase_id", "click_id", "cast(p_ts as string)",
      "cast(c_ts as string)", "value")
    // The outer join's null rows emit only when BOTH sides' watermarks
    // pass the purchase's match window, and each side's watermark
    // advances only on its own event type — so the flushing sentinels
    // must be a click AND a purchase (the shared streamed() helper's
    // view-typed sentinels would advance neither).
    def typedSentinel(id: Long, plusMin: Long, typ: String): SEvent =
      SEvent(id, new Timestamp(base + (600 + plusMin) * 60 * 1000),
        999L, typ, 0.25)
    val in = MemoryStream[SEvent]
    val q = EventStreams.attributionAudit(in.toDF())
      .writeStream.format("memory").queryName("parity_audit")
      .outputMode("append").start()
    val got = try {
      fixture.grouped(20).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
      in.addData(typedSentinel(1000, 600, "click"),
        typedSentinel(1001, 600, "purchase"))
      q.processAllAvailable()
      in.addData(typedSentinel(1002, 605, "click"),
        typedSentinel(1003, 605, "purchase"))
      q.processAllAvailable()
      spark.table("parity_audit").filter("user_id <> 999")
        .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    } finally q.stop()
    val want = EventStreams.attributionAudit(fixture.toDF())
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    assert(got == want)
    // r14: the stream is ALSO pinned to the DECLARED q232 plan (the
    // batch formulation the DuckDB oracle hash-checks), closing the
    // q193-style three-way loop: stream == q232 batch == DuckDB
    val declaredCols = Seq("user_id", "purchase_id", "click_id",
      "p_us", "c_us", "value")
    val gotUs = spark.table("parity_audit").filter("user_id <> 999")
      .selectExpr("user_id", "purchase_id", "click_id",
        "unix_micros(p_ts) as p_us", "unix_micros(c_ts) as c_us", "value")
      .selectExpr(declaredCols: _*).collect().map(_.toSeq).toSet
    val declared = graft.ops.NorthStar.attributionAuditBatch(fixture.toDF())
      .selectExpr(declaredCols: _*).collect().map(_.toSeq).toSet
    assert(gotUs == declared,
      "stream output diverged from the declared q232 batch plan")
    assert(want.exists(_(2) == null),
      "fixture has no unattributed purchase — the outer path is untested")
    assert(want.exists(_(2) != null),
      "fixture has no attributed purchase — degenerate")
  }

  test("ewmaPoints: the incremental streaming filter equals the " +
    "DECLARED q238 batch core on the same rows, across micro-batch " +
    "boundaries — including the warmup gate and spike flags") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the shared fixture plus a crafted user whose stream fills the
    // 16-tap window and then genuinely spikes (17 quiet readings, one
    // 12× burst) — the shared users average ~12 events, too few to
    // leave warmup
    val crafted = (0 until 18).map { i =>
      SEvent(2000L + i, new Timestamp(base + i.toLong * 7 * 60 * 1000),
        7L, "view", if (i == 17) 3.0 else 0.25)
    }
    val fx = (fixture ++ crafted).sortBy(e => (e.ts.getTime, e.event_id))
    val in = MemoryStream[SEvent]
    val q = EventStreams.ewmaPoints(in.toDS()).toDF()
      .writeStream.format("memory").queryName("parity_ewma")
      .outputMode("append").start()
    val got =
      try {
        fx.grouped(20).foreach { chunk =>
          in.addData(chunk); q.processAllAvailable()
        }
        in.addData(sentinel(1000, 600)); q.processAllAvailable()
        in.addData(sentinel(1001, 605)); q.processAllAvailable()
        spark.table("parity_ewma").filter("user_id <> 999")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      } finally q.stop()
    // the graded batch twin: q238's window core on the identical frame
    val want = graft.ops.NorthStar.ewmaCore(
        fx.toDF()
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("tus"),
            expr("cast(round(value * 100) as bigint)").as("v_c2")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(got == want)
    assert(want.exists(_._6), "no spike in the fixture — flag untested")
    assert(want.exists(t => t._1 == 7L && !t._6),
      "crafted user has no warmup points")
    assert(want.size == fx.size, "one point per event")
  }

  test("sessionExamples: streaming training examples equal the q164 " +
    "brute-force on the same rows, across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SEvent]
    val q = EventStreams.sessionExamples(in.toDS()).toDF()
      .writeStream.format("memory").queryName("parity_examples")
      .outputMode("append").start()
    val got =
      try {
        fixture.grouped(20).foreach { chunk =>
          in.addData(chunk); q.processAllAvailable()
        }
        in.addData(sentinel(1000, 600)); q.processAllAvailable()
        in.addData(sentinel(1001, 605)); q.processAllAvailable()
        spark.table("parity_examples").filter("user_id <> 999")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getString(3))).toSet
      } finally q.stop()
    // independent reference: q164's split-on-gap scan over the fixture
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = fixture.groupBy(_.user_id).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[SEvent]]
      var prev = Long.MinValue
      for (e <- sorted) {
        if (sessions.isEmpty || e.ts.getTime - prev > 30L * 60 * 1000)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
        prev = e.ts.getTime
      }
      sessions.collect {
        case ses if ses.length >= 3 =>
          val types = ses.map(_.event_type)
          (uid, ses.length.toLong, md5hex(types.init.mkString(" ")),
            types.last)
      }
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture has no 3+-event session — degenerate")
    // three-way closure: the q193 batch formulation (the graded,
    // DuckDB-oracled plan) on the same rows must ALSO match the stream
    val q193 = graft.ops.NorthStar.sessionExamplesBatch(
        fixture.toDF().withColumn("tus",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts"))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(q193 == want, "q193 batch formulation drifted from the stream")
  }

  test("cusumPoints: the incremental change-point monitor equals the " +
    "DECLARED q255 per-day frame on the same rows, across micro-batch " +
    "boundaries — alarms in both directions included") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // 8 days, 2 types: alpha settles +150% on days 5-7 (up alarms),
    // beta drops to a quarter on days 6-7 (one down alarm) — plus a
    // quiet prefix on both so silence is pinned too
    val day0 = Timestamp.valueOf("2024-04-01 00:00:00").getTime
    val cusumFx: Seq[SEvent] = {
      def mk(ty: String, day: Int, n: Int, idBase: Long): Seq[SEvent] =
        (0 until n).map { i =>
          SEvent(idBase + day * 100 + i,
            new Timestamp(day0 + day * 86400000L + i.toLong * 7 * 60 * 1000),
            1L, ty, 0.25)
        }
      val alpha = (0 until 8).flatMap(d =>
        mk("alpha", d, if (d >= 5) 25 else 10, 10000L))
      val beta = (0 until 8).flatMap(d =>
        mk("beta", d, if (d >= 6) 2 else 8, 20000L))
      (alpha ++ beta).sortBy(e => (e.ts.getTime, e.event_id))
    }
    // batch side: the graded per-day frame (q255's cusumDays) and the
    // targets the deployed monitor would take from the batch init
    val DayUs = 86400000000L
    val counts = cusumFx.toDF()
      .select(col("event_type"),
        expr(s"(unix_micros(ts) div $DayUs) * $DayUs").as("day"))
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val days = graft.ops.Corpus.cusumDays(counts)
    val want = days
      .selectExpr("event_type", "day", "cnt", "splus", "sminus",
        "splus > h as up", "sminus > h as dn")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6))).toSet
    val targets = days.selectExpr("event_type", "med").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap +
      ("zz_sentinel" -> 1L)

    def sent(id: Long, plusMin: Long): SEvent =
      SEvent(id, new Timestamp(day0 + 30L * 86400000L + plusMin * 60000L),
        999L, "zz_sentinel", 0.25)
    val in = MemoryStream[SEvent]
    val q = EventStreams.cusumPoints(in.toDS(), targets).toDF()
      .writeStream.format("memory").queryName("parity_cusum")
      .outputMode("append").start()
    val got =
      try {
        cusumFx.grouped(25).foreach { chunk =>
          in.addData(chunk); q.processAllAvailable()
        }
        in.addData(sent(1000, 0)); q.processAllAvailable()
        in.addData(sent(1001, 5)); q.processAllAvailable()
        spark.table("parity_cusum").filter("event_type <> 'zz_sentinel'")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getBoolean(5), r.getBoolean(6))).toSet
      } finally q.stop()
    assert(got == want,
      "stream diverged from the declared q255 per-day frame")
    assert(want.exists(_._6), "no up alarm in the fixture — untested")
    assert(want.exists(_._7), "no down alarm in the fixture — untested")
    assert(want.exists(t => !t._6 && !t._7), "no quiet day — degenerate")
    assert(got.size == 16, "timeout flush must emit the final open days")
  }

  test("gapPoints: the streaming inter-event-gap monitor equals the " +
    "shared q211 gapPairs core on the same rows, across micro-batch " +
    "boundaries — zero gaps included; idle eviction restarts the chain") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the shared fixture plus a crafted zero-gap pair (two events, one
    // instant) so the b = -1 bucket is exercised
    val crafted = Seq(
      SEvent(3000L, new Timestamp(base + 42L * 60 * 1000), 8L, "view", 0.25),
      SEvent(3001L, new Timestamp(base + 42L * 60 * 1000), 8L, "view", 0.25),
      SEvent(3002L, new Timestamp(base + 90L * 60 * 1000), 8L, "view", 0.25))
    val fx = (fixture ++ crafted).sortBy(e => (e.ts.getTime, e.event_id))
    val in = MemoryStream[SEvent]
    val q = EventStreams.gapPoints(in.toDS()).toDF()
      .writeStream.format("memory").queryName("parity_gaps")
      .outputMode("append").start()
    val (got, afterEvict) =
      try {
        fx.grouped(20).foreach { chunk =>
          in.addData(chunk); q.processAllAvailable()
        }
        val before = spark.table("parity_gaps").filter("user_id <> 999")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSet
        // push the watermark past every user's idle deadline (the
        // 4-hour default + the 2-hour watermark delay), then send one
        // more event for user 8: its state was EVICTED, so the chain
        // restarts and NO gap may be emitted for it
        in.addData(sentinel(1000, 600)); q.processAllAvailable()
        in.addData(sentinel(1001, 605)); q.processAllAvailable()
        in.addData(SEvent(3003L,
          new Timestamp(base + (600 + 610) * 60 * 1000), 8L, "view", 0.25))
        q.processAllAvailable()
        val after = spark.table("parity_gaps").filter("user_id <> 999")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSet
        (before, after)
      } finally q.stop()
    val want = graft.ops.NorthStar.gapPairs(
        fx.toDF().withColumn("tus", expr("unix_micros(ts)")))
      .withColumn("b", when(col("gap") === 0L, lit(-1L))
        .otherwise((length(expr("bin(gap)")) - 1).cast("long")))
      .selectExpr("user_id", "event_id", "tus", "prev_tus", "gap", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want, "stream diverged from the shared q211 gap core")
    assert(want.exists(_._6 == -1L), "no zero gap — the -1 bucket untested")
    assert(want.map(_._6).size > 3, "gap buckets degenerate")
    assert(afterEvict == got,
      "an evicted user emitted a cross-horizon gap — TTL contract broken")
  }
}
