package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q176 band tuning: the decile histogram recomputed driver-side —
  * candidate pairs from the (oracle-green) q72 output, exact Jaccard
  * from the raw text, the same integer basis-point decile. */
class BandTuningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("histogram equals a driver-side recompute over q72's pairs") {
    val text = T(spark, SparkTestBase.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(id: Long): Set[String] = {
      val w = text(id).split(" ")
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val pairs = TrainingData.q72DedupMinhash(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = pairs.map { case (a, b) =>
      val sa = shingles(a); val sb = shingles(b)
      val i = (sa & sb).size.toLong
      val u = sa.size + sb.size - i
      ((2 * i * 10000 + u) / (2 * u)) / 1000
    }.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }

    val got = TrainingData.q176BandTuning(spark, SparkTestBase.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got == want)
    assert(got.values.sum == pairs.length.toLong)
  }
}
