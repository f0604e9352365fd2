package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q212 (nearest-event alignment) beyond the DuckDB oracle (which runs
  * the same two-direction carry): a driver-side brute force that picks
  * the nearest event by direct candidate scan — no union, no windows —
  * replicating the declared tie policy (equal distance → the earlier
  * event; at-order-time events belong to the FORWARD carry at dist 0 —
  * the backward carry is strictly-after), plus the coverage properties
  * of the user spaces. */
class NearestEventSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("q212 equals the direct-scan brute force with the declared tie " +
    "policy") {
    val evs = T.events(spark, dir)
      .select("user_id", "tus", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.map(_._2).sortBy(t => (t._1, t._2)).toSeq
      }
    val orders = T(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val got = NorthStar.q212NearestEvent(spark, dir).collect().map { r =>
      r.getLong(0) -> ((if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    }.toMap
    assert(got.size == orders.length)

    orders.foreach { case (ok, u, t) =>
      val cands = evs.getOrElse(u, Seq.empty)
      // forward carry: last (et, id) with et <= t (largest id at ties);
      // backward carry: first with et > t (smallest id at that et)
      val prev = cands.filter(_._1 <= t).lastOption
      val next = cands.find(_._1 > t)
      val exp = (prev, next) match {
        case (None, None) => (None, "(none)", None)
        case (Some(p), None) => (Some(p._2), p._3, Some(t - p._1))
        case (None, Some(n)) => (Some(n._2), n._3, Some(n._1 - t))
        case (Some(p), Some(n)) =>
          if (t - p._1 <= n._1 - t) (Some(p._2), p._3, Some(t - p._1))
          else (Some(n._2), n._3, Some(n._1 - t))
      }
      assert(got(ok) == exp, s"order $ok user $u t $t")
    }
  }

  test("coverage: users without events resolve to '(none)', users with " +
    "events always align, and both cases occur") {
    val rows = NorthStar.q212NearestEvent(spark, dir).collect()
    val none = rows.count(_.getString(3) == "(none)")
    assert(none > 0, "no order outside the event-user space — fixture " +
      "degenerate for the no-events path")
    assert(none < rows.length, "every order unaligned")
    rows.foreach { r =>
      assert((r.getString(3) == "(none)") == r.isNullAt(4))
      if (!r.isNullAt(4)) assert(r.getLong(4) >= 0L)
    }
  }
}
