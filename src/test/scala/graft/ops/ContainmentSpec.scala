package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q179 containment: per-pair values recomputed driver-side from raw
  * text over the oracle-green q72 candidate set, plus the asymmetry
  * invariant (containment dominates Jaccard — min(|A|,|B|) ≤ |A∪B|). */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def r4(num: Long, den: Long): Double =
    ((2 * num * 10000 + den) / (2 * den)).toDouble / 10000.0

  test("per-pair containment equals the driver-side recompute") {
    val text = T(spark, SparkTestBase.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(id: Long): Set[String] = {
      val w = text(id).split(" ")
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val want = TrainingData.q72DedupMinhash(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) =>
        val (sa, sb) = (sh(a), sh(b))
        val i = (sa & sb).size.toLong
        val small = math.min(sa.size, sb.size).toLong
        val c = r4(i, small)
        (a, b, i, small, c, c >= 0.9)
      }.sortBy(t => (t._1, t._2)).toSeq

    val got = TrainingData.q179Containment(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("containment dominates Jaccard on every candidate pair") {
    val rows = TrainingData.candidateOverlaps(spark, SparkTestBase.Sf0001)
      .selectExpr("i", "na", "nb").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (i, na, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cont = i.toDouble / math.min(na, nb)
      val jac = i.toDouble / (na + nb - i)
      assert(cont >= jac)
    }
  }
}
