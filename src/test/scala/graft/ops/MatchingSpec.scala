package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q248 (spatial radius join) and q249 (greedy one-to-one matching)
  * beyond their DuckDB oracles: driver-side brute forces (the N² scan
  * and the sequential greedy loop the distributed shapes must equal),
  * exactly-once pair emission, the one-to-one invariant, and blocking
  * consistency. */
class MatchingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  // ---- q248 ----------------------------------------------------------

  private def coord(axis: String, k: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$axis:$k").substring(0, 12), 16) % 1000000L

  private lazy val points: Seq[(Long, Long, Long)] =
    T(spark, dir, "customer").select("c_custkey").collect()
      .map(_.getLong(0)).map(k => (k, coord("x", k), coord("y", k))).toSeq

  test("q248 equals the driver-side N² brute force, each pair exactly " +
    "once with its exact integer distance") {
    val r2 = Matching.SpatialR * Matching.SpatialR
    val expect = (for {
      (ka, xa, ya) <- points; (kb, xb, yb) <- points
      if ka < kb
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r2
    } yield (ka, kb, d2)).sorted
    val got = Matching.q248SpatialJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    assert(got.distinct.size == got.size, "duplicate pair emitted")
    assert(expect.nonEmpty, "no within-radius pair at this SF — the " +
      "refine branch is untested")
    assert(expect.size.toLong <
      points.size.toLong * (points.size - 1) / 2,
      "every pair within radius — the blocking prunes nothing")
  }

  test("q248 grid premise: every qualifying pair sits at most one cell " +
    "apart on both axes (the 3×3 neighborhood suffices)") {
    val r2 = Matching.SpatialR * Matching.SpatialR
    for {
      (ka, xa, ya) <- points; (kb, xb, yb) <- points
      if ka < kb &&
        (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= r2
    } {
      assert(math.abs(xa / Matching.SpatialR - xb / Matching.SpatialR) <= 1)
      assert(math.abs(ya / Matching.SpatialR - yb / Matching.SpatialR) <= 1)
    }
  }

  // ---- q249 ----------------------------------------------------------

  private lazy val custs: Seq[(Long, Int, Long)] =
    T(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
        expr("cast(round(c_acctbal * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  private lazy val supps: Seq[(Long, Int, Long)] =
    T(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"),
        expr("cast(round(s_acctbal * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  /** Sequential mutual-argmin rounds — the explicit form of the packed
    * aggregates. */
  private lazy val greedy: Seq[(Int, Long, Long, Long)] = {
    var pool = for {
      (c, cn, cc2) <- custs; (p, sn, sc2) <- supps if cn == sn
    } yield (c, p, math.abs(cc2 - sc2))
    val out = Seq.newBuilder[(Int, Long, Long, Long)]
    for (round <- 1 to Matching.MatchRounds) {
      val bestC = pool.groupBy(_._1).map { case (_, v) =>
        v.minBy(t => (t._3, t._2))
      }.toSeq
      val won = bestC.groupBy(_._2).map { case (_, v) =>
        v.minBy(t => (t._3, t._1))
      }.toSeq
      won.foreach { case (c, p, d) => out += ((round, c, p, d)) }
      val wc = won.map(_._1).toSet; val wp = won.map(_._2).toSet
      pool = pool.filterNot(t => wc(t._1) || wp(t._2))
    }
    out.result()
  }

  test("q249 equals the sequential greedy mutual-argmin brute force — " +
    "rounds, partners, distances") {
    val got = Matching.q249GreedyMatch(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._2, t._3))
    assert(got == greedy.sortBy(t => (t._2, t._3)))
    assert(got.nonEmpty)
  }

  test("one-to-one: no customer and no supplier is matched twice, and " +
    "every match respects the nation block") {
    val cn = custs.map(t => t._1 -> t._2).toMap
    val sn = supps.map(t => t._1 -> t._2).toMap
    val got = Matching.q249GreedyMatch(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.map(_._2).distinct.length == got.length)
    got.foreach { case (c, p) => assert(cn(c) == sn(p)) }
  }

  test("rounds matter at the graded scale: a supplier contested in " +
    "round 1 frees its losing proposers to match later (sf0.001's " +
    "0–1 suppliers per nation drain the pool in one round — sf0.01's " +
    "4 per nation genuinely iterate)") {
    val rounds = Matching.q249GreedyMatch(spark, "/root/testdata/sf0.01")
      .select("round").distinct().collect().map(_.getInt(0)).toSet
    assert(rounds.size > 1,
      "all matches landed in round 1 — the iteration is untested")
  }
}
