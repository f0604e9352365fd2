package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The KLL quantile rollup: merged-of-daily estimates must sit within
  * the published normalized-rank-error bound of the EXACT quantiles
  * (computed driver-side from the raw values), the sketches must cover
  * every event exactly once, and the rollup must answer without
  * touching raw events again. KLL compaction is randomized, so the
  * spec pins BOUNDS, not bit values — the exact-merge alternative when
  * a domain can be declared is the q115 histogram family. */
class KllRollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val values: Array[Double] =
    T.events(spark, SparkTestBase.Sf0001)
      .select("value").collect().map(_.getDouble(0)).sorted

  test("merged daily sketches answer within the KLL rank-error bound") {
    val daily = SketchRollup.dailyValueKll(
      T.events(spark, SparkTestBase.Sf0001))
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val ests = SketchRollup.mergedKllQuantiles(daily, qs)
    val n = values.length.toDouble
    qs.zip(ests).foreach { case (q, est) =>
      // normalized rank of the estimate vs the target rank; k=200 KLL
      // guarantees ~1.65% — 3.5% gives merge + randomization headroom
      val rank = values.count(_ <= est) / n
      assert(math.abs(rank - q) <= 0.035, s"q=$q est=$est rank=$rank")
    }
  }

  test("every event is sketched exactly once; blobs stay KB-sized") {
    val daily = SketchRollup.dailyValueKll(
      T.events(spark, SparkTestBase.Sf0001)).collect()
    assert(daily.nonEmpty)
    val sketched = daily.map(_.getLong(2)).sum
    assert(sketched == values.length.toLong)
    daily.foreach { r =>
      assert(r.getAs[Array[Byte]](1).length < 64 * 1024)
    }
  }
}
