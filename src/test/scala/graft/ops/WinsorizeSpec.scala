package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q208 (per-source winsorization) beyond the DuckDB oracle (same
  * lower-quantile formulation): a driver-side brute force with an
  * independently coded sort-and-index quantile, plus the properties
  * that make clipping meaningful — thresholds are actual data values,
  * clip counts are bounded by the quantile definition, and the
  * winsorized sum moves in the direction the one-sided clips allow
  * (no clip → unchanged; low-only → raises; high-only → lowers). */
class WinsorizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val bySource: Map[String, Seq[Long]] =
    T(spark, dir, "documents").select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sorted.toSeq }

  private lazy val got = Audit.q208Winsorize(spark, dir).collect()
    .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap

  test("q208 equals the independent sort-and-index brute force") {
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, xs) =>
      val n = xs.size
      val p05 = xs((n + 19) / 20 - 1) // value at 1-based ⌈n/20⌉
      val p95 = xs((19 * n + 19) / 20 - 1)
      val w = xs.map(x => math.max(p05, math.min(p95, x)))
      val exp = (n.toLong, p05, p95,
        xs.count(_ < p05).toLong, xs.count(_ > p95).toLong, xs.sum, w.sum)
      assert(got(src) == exp, s"$src: got=${got(src)} exp=$exp")
    }
  }

  test("winsorization properties: thresholds are data values, clip " +
    "fractions respect the quantile bound, and clipping actually fires") {
    got.foreach { case (src, (n, p05, p95, lo, hi, raw, wins)) =>
      val xs = bySource(src)
      assert(xs.contains(p05) && xs.contains(p95), src)
      assert(p05 <= p95, src)
      // fewer than ⌈n/20⌉ values can sit strictly below the value AT
      // position ⌈n/20⌉; symmetric above
      assert(lo < (n + 19) / 20, src)
      assert(hi <= n - (19 * n + 19) / 20, src)
      // "moves iff clipped" is NOT an invariant (low- and high-side
      // clips can cancel); the valid directions are:
      if (lo == 0 && hi == 0) assert(wins == raw, src) // no clip → unchanged
      if (hi == 0) assert(wins >= raw, src) // low clips only raise the sum
      if (lo == 0) assert(wins <= raw, src) // high clips only lower it
      assert(wins >= n * p05 && wins <= n * p95, src)
    }
    assert(got.values.exists { case (_, _, _, lo, hi, _, _) => lo + hi > 0 },
      "fixture degenerate: nothing clipped anywhere")
  }
}
