package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q178 best-of-cluster: the keeper recomputed driver-side from the
  * (oracle-green) q100 clusters and q83 qualities — argmax by
  * (quality, then smallest id) — plus the policy invariants. */
class BestOfClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("keeper is the quality argmax per cluster, min-id tiebreak") {
    val quality = TrainingData.q83QualityScore(spark, SparkTestBase.Sf0001)
      .selectExpr("doc_id", "cast(round(quality * 10000) as bigint)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // member-level clusters via the brute-force union-find over q72 pairs
    val pairs = TrainingData.q72DedupMinhash(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.map(n => (find(n), n))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    val want = members.map { case (root, ns) =>
      val keeper = ns.minBy(n => (-quality(n), n))
      root -> (keeper, quality(keeper), ns.size.toLong,
        keeper != ns.min)
    }

    val got = Curation.q178BestOfCluster(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("the quality policy genuinely differs from min-id somewhere") {
    // a corpus where they never differ would make q178 a no-op
    // disguised as policy (the q165 budget-binds argument)
    val n = Curation.q178BestOfCluster(spark, SparkTestBase.Sf0001)
      .filter("differs").count()
    assert(n > 0)
  }
}
