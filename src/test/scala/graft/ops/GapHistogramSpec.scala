package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q211 (power-of-2 gap histogram) beyond the DuckDB oracle (same bit-
  * length formulation): a driver-side brute force whose log₂ comes from
  * Long.numberOfLeadingZeros — a different exact mechanism than the
  * engine's length(bin(x)) − 1 — plus the bucket invariants a histogram
  * consumer relies on. */
class GapHistogramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val gaps: Seq[Long] =
    T.events(spark, dir).select("user_id", "tus", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values.flatMap { rs =>
        val ts = rs.map(t => (t._2, t._3)).sorted.map(_._1)
        ts.zip(ts.tail).map { case (a, b) => b - a }
      }.toSeq

  private def bucket(g: Long): Long =
    if (g == 0L) -1L else (63 - java.lang.Long.numberOfLeadingZeros(g)).toLong

  test("q211 equals the numberOfLeadingZeros brute force") {
    val exp = gaps.groupBy(bucket).map { case (b, gs) =>
      b -> ((gs.size.toLong, gs.min, gs.max))
    }
    val got = NorthStar.q211GapHistogram(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == exp)
    assert(gaps.nonEmpty)
  }

  test("bucket invariants: ranges nest in [2^b, 2^(b+1)), counts total " +
    "to the gap count, lo_us is the exact power") {
    val rows = NorthStar.q211GapHistogram(spark, dir).collect()
    assert(rows.map(_.getLong(2)).sum == gaps.size.toLong)
    rows.foreach { r =>
      val (b, lo, mn, mx) =
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      if (b < 0) { assert(lo == 0L && mn == 0L && mx == 0L) }
      else {
        assert(lo == (1L << b))
        assert(mn >= lo && mx < 2 * lo && mn <= mx, s"b=$b")
      }
    }
    assert(rows.length > 3, "degenerate fixture: too few buckets")
  }
}
