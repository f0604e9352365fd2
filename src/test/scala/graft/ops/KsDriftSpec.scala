package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q219 (two-sample KS drift) beyond the DuckDB oracle (same
  * cross-multiplied formulation): a driver-side brute force computing
  * both ecdfs by direct counting (no prefix machinery), plus the
  * statistic's defining properties — D is scale-free ([0, 10⁴] bp),
  * the argmax value is an actual data value where the ecdfs genuinely
  * achieve the max gap, and the fixture's halves genuinely differ. */
class KsDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val halves: (Seq[Long], Seq[Long]) = {
    val rows = T(spark, dir, "documents").select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue))
    (rows.collect { case (d, v) if d % 2 == 0 => v }.toSeq,
      rows.collect { case (d, v) if d % 2 != 0 => v }.toSeq)
  }

  private lazy val expected: (Long, Long, Long, Long) = {
    val (a, b) = halves
    val (n1, n2) = (a.size.toLong, b.size.toLong)
    val values = (a ++ b).distinct.sorted
    val scored = values.map { v =>
      val f1 = a.count(_ <= v).toLong
      val f2 = b.count(_ <= v).toLong
      (v, math.abs(f1 * n2 - f2 * n1))
    }
    val dMax = scored.map(_._2).max
    val at = scored.collect { case (v, d) if d == dMax => v }.min
    (n1, n2, at, dMax * 10000L / (n1 * n2))
  }

  test("q219 equals the direct-counting brute force (numerator argmax, " +
    "smallest-value tie-break, floor-scaled bp)") {
    val r = Corpus.q219KsDrift(spark, dir).collect()
    assert(r.length == 1)
    val got = (r(0).getLong(0), r(0).getLong(1),
      r(0).getAs[Number](2).longValue, r(0).getLong(3))
    assert(got == expected, s"got=$got exp=$expected")
  }

  test("KS properties: bp bounds, argmax is a data value, halves " +
    "genuinely differ, and a self-comparison would read zero") {
    val (n1, n2, at, dBp) = expected
    assert(n1 > 0 && n2 > 0)
    assert(dBp >= 0L && dBp <= 10000L)
    assert((halves._1 ++ halves._2).contains(at))
    assert(dBp > 0L, "fixture degenerate: the halves' length " +
      "distributions are identical — drift undetectable")
    // self-comparison sanity on the same numerator formula
    val self = halves._1
    val n = self.size.toLong
    val d0 = self.distinct.map(v =>
      math.abs(self.count(_ <= v).toLong * n - self.count(_ <= v).toLong * n)).max
    assert(d0 == 0L)
  }
}
