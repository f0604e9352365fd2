package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q223 (weighted quantiles) beyond the DuckDB oracle (same
  * cumulative-weight formulation): a driver-side brute force that
  * sorts and accumulates with plain Scala, plus the definitional
  * properties — each weighted quantile is an actual data value, the
  * mass below it genuinely reaches the target fraction (and the value
  * below it does not — minimality), wp50 ≤ wp90, and the weighted and
  * row medians genuinely DIFFER somewhere (otherwise the op adds
  * nothing over q208). */
class WeightedQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** (source → sorted (n_chars, token-weight) rows). */
  private lazy val bySource: Map[String, Seq[(Long, Long)]] =
    T(spark, dir, "documents").select("source", "n_chars", "text")
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue,
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
      .groupBy(_._1)
      .map { case (s, rs) => s -> rs.map(t => (t._2, t._3)).sortBy(_._1).toSeq }

  private def wq(xs: Seq[(Long, Long)], num: Long, den: Long): Long = {
    val total = xs.map(_._2).sum
    var cum = 0L
    xs.foreach { case (v, w) =>
      cum += w
      if (cum * den >= total * num) return v
    }
    xs.last._1
  }

  private lazy val got: Map[String, (Long, Long, Long)] =
    Audit.q223WeightedQuantile(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getAs[Number](2).longValue,
        r.getAs[Number](3).longValue))).toMap

  test("q223 equals the sort-and-accumulate brute force per source") {
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, xs) =>
      val exp = (xs.map(_._2).sum, wq(xs, 1, 2), wq(xs, 9, 10))
      assert(got(src) == exp, s"$src: got=${got(src)} exp=$exp")
    }
  }

  test("definitional properties: minimality, ordering, and the weighted " +
    "median differs from the row median somewhere") {
    bySource.foreach { case (src, xs) =>
      val (w, p50, p90) = got(src)
      val values = xs.map(_._1)
      assert(values.contains(p50) && values.contains(p90), src)
      assert(p50 <= p90, src)
      // mass at or below the quantile reaches the target…
      def massLe(v: Long) = xs.collect { case (x, wt) if x <= v => wt }.sum
      assert(2 * massLe(p50) >= w, src)
      assert(10 * massLe(p90) >= 9 * w, src)
      // …and minimality: the largest strictly-smaller VALUE does not
      values.filter(_ < p50).lastOption.foreach(v =>
        assert(2 * massLe(v) < w, src))
      values.filter(_ < p90).lastOption.foreach(v =>
        assert(10 * massLe(v) < 9 * w, src))
    }
    val rowMedianDiffers = bySource.exists { case (src, xs) =>
      val sorted = xs.map(_._1)
      sorted((sorted.size + 1) / 2 - 1) != got(src)._2
    }
    assert(rowMedianDiffers,
      "fixture degenerate: weighted and row medians identical everywhere")
  }
}
