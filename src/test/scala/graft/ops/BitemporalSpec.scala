package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q247 (bitemporal PIT) beyond the DuckDB oracle: a driver-side
  * truth-table recomputation of every (T, V) cell from raw orders, and
  * the axis-discrimination invariants that prove BOTH time axes move
  * independently — the semantics neither q221 (txn only) nor q197
  * (valid only) can express. */
class BitemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** (key, cents) for every order. */
  private lazy val orders: Seq[(Long, Long)] =
    T(spark, dir, "orders").select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** Driver-side cell: live keys and price sum as known at txn t,
    * effective at order date + voff days. */
  private def cell(t: Int, voff: Int): (Long, Long) = {
    val rows = orders.flatMap { case (k, c2) =>
      // ops known at t whose valid_from offset ≤ voff, latest vf wins
      val ops = Seq((0, 0, "I", c2)) ++
        (if (k % 5 == 0) Seq((1, 30, "U", c2 + 1000L)) else Nil) ++
        (if (k % 7 == 0) Seq((2, 60, "D", -1L)) else Nil)
      val vis = ops.filter(o => o._1 <= t && o._2 <= voff)
      val eff = vis.maxBy(o => (o._2, o._1))
      if (eff._3 == "D") None else Some(eff._4)
    }
    (rows.size.toLong, rows.sum)
  }

  private lazy val got =
    Curation.q247BitemporalPit(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("q247 equals the driver-side truth table on all nine (T, V) " +
    "cells") {
    assert(got.keySet ==
      (for (t <- 0 to 2; v <- Seq(15, 45, 75)) yield (t, v)).toSet)
    got.keys.foreach(k => assert(got(k) == cell(k._1, k._2), s"cell $k"))
  }

  test("the transaction axis moves alone: at V = +15d nothing is " +
    "effective yet, so all three T rows agree — knowing MORE cannot " +
    "change an effective date in the past") {
    assert(got((0, 15)) == got((1, 15)) && got((1, 15)) == got((2, 15)))
  }

  test("the valid axis moves alone at fixed T: at T = 2 the update " +
    "lands at +45d (price rises, nothing dies) and the cancellation " +
    "at +75d (rows die)") {
    val n5 = orders.count(_._1 % 5 == 0).toLong
    val n7 = orders.count(_._1 % 7 == 0).toLong
    assert(n5 > 0 && n7 > 0, "fixture degenerate")
    assert(got((2, 45))._1 == got((2, 15))._1)
    assert(got((2, 45))._2 == got((2, 15))._2 + 1000L * n5)
    assert(got((2, 75))._1 == got((2, 45))._1 - n7)
  }

  test("the axes are NOT interchangeable: the update known at T=1 is " +
    "invisible at V=+15d but visible at V=+45d, while at T=0 the same " +
    "V shows nothing — the cell depends on BOTH coordinates") {
    assert(got((1, 45)) != got((1, 15)))
    assert(got((1, 45)) != got((0, 45)))
  }
}
