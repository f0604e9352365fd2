package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q238 (exact dyadic EWMA) beyond the DuckDB oracle: a driver-side
  * 16-tap filter recomputation over every sampled user's full ordered
  * stream, the warmup gate (zero-padded history can never flag a
  * spike), and the fixed-point algebra (tap weights halve and sum to
  * 2¹⁶ − 1). */
class EwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val Taps = NorthStar.EwmaTaps

  /** Per sampled user, the (tus, event_id, cents) stream in query
    * order, rebuilt driver-side. */
  private lazy val streams: Map[Long, Seq[(Long, Long, Long)]] =
    T.events(spark, dir)
      .filter(col("user_id") % 3 === 0)
      .select(col("user_id"), col("tus"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("c2"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
      .map { case (u, v) => u -> v.map(_._2).sortBy(t => (t._1, t._2)) }

  private lazy val got =
    NorthStar.q238EwmaSmooth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap

  test("q238 equals the driver-side 16-tap filter on every sampled row") {
    val expect = streams.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case ((tus, eid, c2), i) =>
        val ewma = (0 until Taps).map { t =>
          (if (i - t >= 0) evs(i - t)._3 else 0L) * (1L << (Taps - 1 - t))
        }.sum
        val full = i - (Taps - 1) >= 0
        (u, tus, eid) -> (c2, ewma, full && c2 * 327680L > ewma * 9L)
      }
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, v) => assert(got(k) == v, s"row $k") }
  }

  test("warmup gate: no row among a user's first 15 events ever spikes, " +
    "however large its reading (zero-padded history must not false-fire)") {
    streams.foreach { case (u, evs) =>
      evs.take(Taps - 1).foreach { case (tus, eid, _) =>
        assert(!got((u, tus, eid))._3, s"warmup spike at user $u")
      }
    }
  }

  test("fixed-point algebra: a constant stream converges to " +
    "cents · (2¹⁶ − 1) — the weights sum to one minus the tap-15 " +
    "truncation unit") {
    assert((0 until Taps).map(i => 1L << (Taps - 1 - i)).sum == 65535L)
  }

  test("spikes exist on the fixture (a flag that never fires is " +
    "pinned by nothing)") {
    assert(got.values.exists(_._3))
    assert(got.values.exists(!_._3))
  }
}
