package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q199 (hierarchical sweep-line concurrency) beyond the DuckDB oracle:
  * an INDEPENDENT driver-side brute force — sessionization by a plain
  * sort-and-split scan (not lag+cumsum) and the per-day peak by direct
  * per-µs interval counting over the sweep's candidate instants — so
  * neither the session derivation nor the two-level prefix
  * decomposition shares a formulation with what it checks. */
class ConcurrencyPeakSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private val DayUs = 86400000000L
  private val GapUs = 1800000000L

  /** Brute sessions: per user, sort event times, split on gaps. */
  private lazy val sessions: Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions.col
    T.events(spark, dir).select(col("user_id"), col("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { evs =>
        val ts = evs.map(_._2).sorted
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = ts.head
        var prev = ts.head
        for (t <- ts.tail) {
          if (t - prev > GapUs) { out += ((start, prev)); start = t }
          prev = t
        }
        out += ((start, prev))
        out.toSeq
      }.toSeq
  }

  /** Brute per-day peak: concurrency is piecewise-constant, changing
    * only at interval endpoints, so evaluating at every clipped start
    * instant within the day is exhaustive (closed intervals: a session
    * starting the µs another ends overlaps it). */
  private lazy val brute: Map[Long, (Long, Long)] = {
    val byDay = sessions.flatMap { case (a, b) =>
      (a / DayUs to b / DayUs).map { d =>
        (d, math.max(a, d * DayUs), math.min(b, (d + 1) * DayUs - 1))
      }
    }.groupBy(_._1)
    byDay.map { case (d, clips) =>
      val peak = clips.map { case (_, gs, _) =>
        clips.count { case (_, a, b) => a <= gs && gs <= b }.toLong
      }.max
      d * DayUs -> (peak, clips.size.toLong)
    }
  }

  test("q199 equals the independent brute force (every day, peak and " +
    "session count)") {
    val got = NorthStar.q199ConcurrencyPeak(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == brute)
    assert(brute.values.exists(_._1 > 1),
      "degenerate fixture: no day ever has two concurrent sessions")
  }

  test("decomposition sanity: peak never exceeds the day's session " +
    "count and every session-touched day is present") {
    brute.foreach { case (d, (peak, n)) =>
      assert(peak >= 1 && peak <= n, s"day $d: peak=$peak n=$n")
    }
    assert(brute.nonEmpty)
  }
}
