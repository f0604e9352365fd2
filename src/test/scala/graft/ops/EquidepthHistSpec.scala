package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q225 (equi-depth histogram boundaries) beyond the DuckDB oracle
  * (same ntile layout): a driver-side brute force that sorts and
  * slices with plain Scala, plus the properties that make the artifact
  * usable as optimizer stats — depths differ by at most one with the
  * deeper buckets FIRST (the SQL ntile layout), boundaries are
  * non-decreasing across buckets (lo ≤ hi within, hi ≤ next lo
  * between), total depth is the table, and a mid-range selectivity
  * estimate read off the histogram brackets the true count. */
class EquidepthHistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val cents: Seq[Long] =
    T(spark, dir, "orders").select("o_totalprice", "o_orderkey").collect()
      .map(r => (math.round(r.getDouble(0) * 100), r.getAs[Number](1).longValue))
      .sortBy(identity).map(_._1).toSeq

  private lazy val got: Seq[(Int, Long, Long, Long)] =
    Relational.q225EquidepthHist(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("q225 equals the sort-and-slice brute force") {
    val n = cents.size
    val (q, rem) = (n / 32, n % 32)
    var off = 0
    val exp = (1 to 32).map { b =>
      val len = if (b <= rem) q + 1 else q
      val slice = cents.slice(off, off + len)
      off += len
      (b, len.toLong, slice.min, slice.max)
    }
    assert(got == exp)
  }

  test("stats-artifact properties: ±1 depths (deep buckets first), " +
    "ordered boundaries, full coverage, usable selectivity") {
    val depths = got.map(_._2)
    assert(depths.max - depths.min <= 1L)
    assert(depths == depths.sorted.reverse, "deeper buckets must be first")
    assert(depths.sum == cents.size.toLong)
    got.foreach { case (b, _, lo, hi) => assert(lo <= hi, s"bucket $b") }
    got.sliding(2).foreach {
      case Seq((_, _, _, hi1), (b2, _, lo2, _)) =>
        assert(hi1 <= lo2, s"bucket $b2 overlaps its predecessor")
      case _ =>
    }
    // selectivity sanity: rows in [lo, hi] of bucket k..m is bounded by
    // the histogram's own depth sum for those buckets (boundary values
    // can repeat across bucket edges, so the histogram may undercount
    // by at most the two edge-value multiplicities — assert the bracket)
    val (lo, hi) = (got(8)._3, got(23)._4)
    val trueCount = cents.count(c => c >= lo && c <= hi).toLong
    val histCount = got.slice(8, 24).map(_._2).sum
    val edgeSlack = cents.count(_ == lo).toLong + cents.count(_ == hi).toLong
    assert(trueCount >= histCount - edgeSlack && trueCount <= histCount + edgeSlack,
      s"true=$trueCount hist=$histCount slack=$edgeSlack")
  }
}
