package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q289 (exact-integer OLS), q290 (3-step path mining) and q291
  * (discount ladder) beyond their DuckDB oracles: BigInt/driver
  * recomputes plus the semantic pins — the OLS matches an exact
  * rational fit, triples chain only within a user, ladder steps refer
  * to the genuinely previous band. */
class PathLadderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("q289 equals a BigInt exact least squares; slopes vary and the " +
    "floor matches the rational value") {
    val seg = T(spark, dir, "customer").select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val series = T(spark, dir, "orders")
      .selectExpr("o_custkey",
        "year(o_orderdate) * 12 + month(o_orderdate) - 1",
        "cast(round(o_totalprice * 100) as bigint)")
      .collect().map(r => ((seg(r.getLong(0)), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).map { case ((sg, mi), rs) =>
        (sg, mi.toLong, rs.map(_._2).sum) }
      .toSeq
    val want = series.groupBy(_._1).map { case (sg, pts) =>
      val n = BigInt(pts.size)
      val sx = pts.map(p => BigInt(p._2)).sum
      val sy = pts.map(p => BigInt(p._3)).sum
      val sxy = pts.map(p => BigInt(p._2) * BigInt(p._3)).sum
      val sxx = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      // exact floor division (BigInt / truncates toward zero)
      val q = (num - ((num % den) + den) % den) / den
      sg -> (pts.size.toLong, pts.map(_._3).sum, q.toLong)
    }
    val got = graft.SparkEntry.queries("q289_trend_fit")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(got.values.map(_._3).toSeq.distinct.size > 1,
      "every segment fits the same slope — degenerate")
  }

  test("q290 equals the driver-side triple walk; triples never chain " +
    "across users and the top-10 order is total") {
    val ev = T.events(spark, dir)
      .selectExpr("user_id", "tus", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
        .filter(_.size == 3).map(_.mkString(">"))
    }
    val want = paths.groupBy(identity)
      .map { case (p, v) => (p, v.size.toLong) }.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    val got = graft.SparkEntry.queries("q290_path_mining")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    // cross-user chaining would inflate the total triple count
    val totalTriples = ev.groupBy(_._1).values
      .map(es => math.max(0, es.size - 2)).sum
    assert(paths.size == totalTriples,
      "triple count disagrees with per-user window arithmetic")
    assert(got.map(_._1).toSet.size == 10, "top-10 has duplicate paths")
  }

  test("q291 equals the driver-side ladder walk; steps reference the " +
    "genuinely previous band and band 0 has no step") {
    val rows = T(spark, dir, "lineitem")
      .selectExpr("cast(round(l_discount * 100) as bigint)",
        "cast(l_quantity as bigint)",
        "cast(round(l_extendedprice * 100) as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bands = rows.groupBy(_._1).map { case (b, rs) =>
      b -> (rs.length.toLong, rs.map(_._2).sum,
        rs.map(_._2).sum * 100 / rs.length, rs.map(_._3).sum) }
    val got = graft.SparkEntry.queries("q291_discount_ladder")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    assert(got.keySet == bands.keySet)
    got.foreach { case (b, (n, sq, avg, rev, step)) =>
      assert((n, sq, avg, rev) == bands(b), s"band $b")
      step match {
        case Some(st) =>
          assert(bands.contains(b - 1), s"band $b step without predecessor")
          assert(st == avg - bands(b - 1)._3, s"band $b step arithmetic")
        case None =>
          assert(!bands.contains(b - 1), s"band $b missing its step")
      }
    }
    assert(got(got.keys.min)._5.isEmpty, "the lowest band must have no step")
    assert(got.values.count(_._5.isDefined) == got.size - 1)
  }

  test("q292 equals the driver-side bracket walk; the payout is " +
    "monotone in revenue and every tier is reached") {
    val revs = T(spark, dir, "lineitem")
      .selectExpr("l_suppkey", "cast(round(l_extendedprice * 100) as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sum }
    def payout(rev: Long): Long =
      Erp.CommTiers.zipWithIndex.map { case ((lo, rate), i) =>
        val width = if (i + 1 < Erp.CommTiers.length)
          Erp.CommTiers(i + 1)._1 - lo else Long.MaxValue
        math.min(math.max(rev - lo, 0L), width) * rate / 10000
      }.sum
    def tierOf(rev: Long): Long =
      Erp.CommTiers.lastIndexWhere(rev >= _._1).toLong + 1
    val want = revs.map { case (k, rev) =>
      k -> (rev, payout(rev), tierOf(rev)) }
    val got = graft.SparkEntry.queries("q292_commission_tiers")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(got.values.map(_._3).toSet.size > 1,
      "every supplier lands in one tier — brackets untested")
    assert(got.values.exists(_._3 == Erp.CommTiers.length.toLong),
      "the top tier is never reached")
    // marginal monotonicity: sorting by revenue sorts the payout too
    // (a flat-rate-on-total schedule would violate this at thresholds)
    val byRev = got.values.toSeq.sortBy(_._1)
    assert(byRev.map(_._2) == byRev.map(_._2).sorted,
      "payout not monotone in revenue — bracket arithmetic broken")
  }
}
