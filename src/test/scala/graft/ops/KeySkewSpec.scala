package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q180 key-skew histogram: recomputed driver-side (per-key counts,
  * bit-length buckets), and the mass invariants — every order lands in
  * exactly one bucket, the top bucket's max is the true hottest key. */
class KeySkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("histogram equals the driver-side recompute; mass conserved") {
    val keys = T(spark, SparkTestBase.Sf0001, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
    val perKey = keys.groupBy(identity).map { case (_, v) => v.length.toLong }
    val want = perKey.groupBy(c => 63 - java.lang.Long.numberOfLeadingZeros(c))
      .map { case (b, cs) =>
        b.toLong -> (cs.size.toLong, cs.sum, cs.max)
      }

    val got = Relational.q180KeySkew(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty)
    assert(got == want)
    assert(got.values.map(_._2).sum == keys.length.toLong)
    assert(got.values.map(_._3).max == perKey.max)
  }
}
