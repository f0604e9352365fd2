package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
