package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q256 beyond the DuckDB oracle (which unrolls the same rounds): a
  * driver-side peeling brute force on the real corpus (including the
  * derived ⌈mean degree⌉ k), the k-core PROPERTY on the survivor
  * graph, and the cascade fixtures a single-pass filter fails —
  * removing one node must be able to drag its neighbor under k in a
  * LATER round. */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** One driver-side peel round; returns the surviving symmetric
    * edge set. */
  private def peel(edges: Set[(Long, Long)], k: Long): Set[(Long, Long)] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val keep = deg.filter(_._2 >= k).keySet
    edges.filter(e => keep(e._1) && keep(e._2))
  }

  test("q256 trace equals the driver-side peeling on the full corpus, " +
    "k included") {
    val p = Affinity.pairCounts(Affinity.basketItems(spark, dir))
      .filter(col("n_pair") >= 2).select("p1", "p2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = p.flatMap(e => Seq(e, e.swap)).toSet
    val n0 = edges.map(_._1).size.toLong
    val k = (edges.size.toLong + n0 - 1) / n0 // ⌈mean degree⌉, Σdeg = |sym edges|
    val wantRounds = Seq.newBuilder[(Long, Long)]
    wantRounds += ((n0, edges.size.toLong / 2))
    (1 to 4).foreach { _ =>
      edges = peel(edges, k)
      wantRounds += ((edges.map(_._1).size.toLong, edges.size.toLong / 2))
    }
    val want = wantRounds.result()
    val got = graft.SparkEntry.queries("q256_kcore")(spark, dir)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.map(_._1).toSeq == (0 to 4))
    got.foreach { case (r, gk, n, m, _) =>
      assert(gk == k, s"derived k diverged: $gk vs $k")
      assert((n, m) == want(r), s"round $r diverged")
    }
    // monotone peeling: counts never grow
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4)
    }
    val conv = want(4) == want(3)
    assert(got.forall(_._5 == conv))
    // if converged, the survivor set satisfies the k-core property
    if (conv && edges.nonEmpty) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(deg.values.forall(_ >= k), "k-core property violated")
    }
    assert(want(1) != want(0),
      "corpus peels nothing in round 1 — the loop is pinned by nothing")
  }

  test("pendant chain drops in one round; the dense core is the fixpoint") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node deg 3) + pendant chain 4-5, 5-6, 6-7:
    // mean degree = 18/7 → k = ⌈2.57⌉ = 3; round 1 removes 5, 6, 7
    // (all deg ≤ 2 simultaneously); K4 remains and is stable.
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L),
    )
    val edges = und.flatMap(e => Seq(e, e.swap)).toDF("src", "dst")
    val got = Graph.kcoreTrace(spark, edges, 3L, 4)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got(0) == ((7L, 9L, true)))
    assert(got(1) == ((4L, 6L, true)))
    assert(got(2) == ((4L, 6L, true)))
    assert(got(4)._3, "fixpoint must report converged")
  }

  test("true multi-round cascade: the drop propagates over TWO rounds " +
    "(a single filter pass is NOT a k-core)") {
    import spark.implicits._
    // K4 core {1,2,3,4}; node 8 connects to 4, 5, 6 (deg 3) but 5 and 6
    // have deg 2 (to 8 and each other) — round 1 drops 5, 6; round 2
    // drops 8 (now deg 1): the removal CASCADES.
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (8L, 4L), (8L, 5L), (8L, 6L), (5L, 6L),
    )
    val edges = und.flatMap(e => Seq(e, e.swap)).toDF("src", "dst")
    val got = Graph.kcoreTrace(spark, edges, 3L, 4)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(got(0) == ((7L, 10L)))
    assert(got(1) == ((5L, 7L)), "round 1 must drop 5 and 6 only")
    assert(got(2) == ((4L, 6L)), "round 2 must then drop node 8")
    assert(got(3) == ((4L, 6L)))
  }
}
