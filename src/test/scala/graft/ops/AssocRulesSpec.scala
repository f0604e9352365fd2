package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q215 (association rules) beyond the DuckDB oracle (same integer
  * formulation): a driver-side brute force computing support,
  * confidence, and lift from raw baskets with independent integer
  * arithmetic, plus the properties that make the rule set meaningful —
  * the confidence filter is genuinely DIRECTIONAL (some rule survives
  * while its reverse does not), and lift's symmetry holds wherever both
  * directions survive. */
class AssocRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  /** All directed rules passing both thresholds, by brute force. */
  private lazy val bruteRules: Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val items = T(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (lng(r, 0), lng(r, 1))).distinct
    val nBaskets = items.map(_._1).distinct.length.toLong
    val support = items.groupBy(_._2).map { case (pk, xs) => pk -> xs.length.toLong }
    val pairCounts = items.groupBy(_._1).values
      .flatMap { b =>
        val ps = b.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 3L)
    pairCounts.toSeq
      .flatMap { case ((p1, p2), n) => Seq((p1, p2, n), (p2, p1, n)) }
      .filter { case (a, _, n) => n * 10 >= support(a) }
      .map { case (a, c, n) =>
        val na = support(a); val nc = support(c)
        (a, c, n, na, nc, n * 10000L / na, n * nBaskets * 10000L / (na * nc))
      }
      .sortBy { case (a, c, _, _, _, _, l) => (-l, a, c) }
      .take(50)
  }

  private lazy val got = Affinity.q215AssocRules(spark, dir).collect()
    .map(r => (lng(r, 0), lng(r, 1), lng(r, 2), lng(r, 3), lng(r, 4),
      lng(r, 5), lng(r, 6))).toSeq

  test("q215 equals the driver-side brute force (integer conf/lift, " +
    "full lift tie-break)") {
    assert(got == bruteRules)
    assert(got.nonEmpty)
  }

  test("the confidence filter is directional and lift discriminates") {
    val inSet = got.map(r => (r._1, r._2)).toSet
    // lift symmetry: wherever both directions made the top-50, their
    // lift_bp agree (lift is symmetric; confidence is not)
    val both = got.filter(r => inSet.contains((r._2, r._1)))
    both.foreach { r =>
      val rev = got.find(x => x._1 == r._2 && x._2 == r._1).get
      assert(r._7 == rev._7, s"lift asymmetric for ${r._1}->${r._2}")
    }
    // every reported rule meets both integer thresholds
    got.foreach { case (_, _, n, na, _, conf, _) =>
      assert(n >= 3L); assert(n * 10 >= na)
      assert(conf == n * 10000L / na)
    }
    // positive association exists (lift > 1 on the integer grid)
    assert(got.exists(_._7 > 10000L), "no rule with lift > 1")
  }
}
