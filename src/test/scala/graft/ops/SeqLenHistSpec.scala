package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q184 sequence-length histogram: recomputed driver-side from q84's
  * per-doc subword counts — bit-length banding, mass conservation. */
class SeqLenHistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("bands equal the driver-side recompute; token mass conserved") {
    val perDoc = TrainingData.q84TokenCount(spark, SparkTestBase.Sf0001)
      .collect().map(_.getLong(3)).filter(_ > 0)
    val want = perDoc
      .groupBy(n => 63 - java.lang.Long.numberOfLeadingZeros(n))
      .map { case (b, ns) =>
        b.toLong -> (ns.length.toLong, ns.sum, ns.min, ns.max)
      }
    val got = TrainingData.q184SeqLenHist(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => r.getInt(0).toLong ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    assert(got == want)
    assert(got.values.map(_._2).sum == perDoc.sum)
  }
}
