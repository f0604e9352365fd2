package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q285 (err-channel replay), q286 (late-data census) and q287
  * (dimension usage) beyond their DuckDB oracles: driver-side
  * recomputes plus the semantic pins — replay is total, disjoint and
  * idempotent; lateness is monotone in the budget and both budgets
  * fire differently; orphan dimension members genuinely exist. */
class ReplayCensusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001


  test("q285 replay is total (merged == universe), disjoint (replayed " +
    "are exactly the corrupted keys), and equals the driver walk") {
    val universe = T(spark, dir, "lineitem")
      .selectExpr("cast(l_orderkey as string)", "l_returnflag", "l_linestatus")
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val got = graft.SparkEntry.queries("q285_errata_replay")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(got.length == universe.length, "replay lost or duplicated rows")
    assert(got.map(t => (t._1, t._2, t._3)).toSet == universe.toSet)
    val (good, replayed) = got.partition(_._4 == "good")
    assert(replayed.nonEmpty, "nothing replayed — repair path untested")
    assert(replayed.forall(_._1.toLong % 97 == 0),
      "a replayed row was never corrupted")
    assert(good.forall(_._1.toLong % 97 != 0),
      "a corrupted row leaked into the good channel")
    // disjointness: no triple appears in both channels
    assert(good.map(t => (t._1, t._2, t._3)).toSet
      .intersect(replayed.map(t => (t._1, t._2, t._3)).toSet).isEmpty)
  }

  test("q286 equals the driver-side arrival replay; lateness is " +
    "monotone in the budget and both budgets fire differently") {
    val ev = graft.ops.T.events(spark, dir)
      .selectExpr("event_id", "event_type", "tus")
      .collect().map { r =>
        val id = r.getLong(0)
        val tk = SparkTestBase.md5Long(s"arr:$id", 12)
        val delay = if (tk % 10 < 2) ((tk / 10) % 7200) * 1000000L else 0L
        (id, r.getString(1), r.getLong(2), r.getLong(2) + delay)
      }
    var runmax = Long.MinValue
    val walked = ev.sortBy(e => (e._4, e._1)).map { case (_, ty, tus, _) =>
      val late1 = runmax > Long.MinValue && tus + NorthStar.LateW1 < runmax
      val late2 = runmax > Long.MinValue && tus + NorthStar.LateW2 < runmax
      runmax = math.max(runmax, tus)
      (ty, late1, late2)
    }
    val want = walked.groupBy(_._1).map { case (ty, rs) =>
      val n = rs.length.toLong
      val l1 = rs.count(_._2).toLong
      val l2 = rs.count(_._3).toLong
      ty -> (n, l1, l2, l1 * 10000 / n, l2 * 10000 / n) }
    val got = graft.SparkEntry.queries("q286_late_census")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    got.values.foreach { case (_, l1, l2, _, _) =>
      assert(l1 >= l2, "a tighter budget dropped FEWER events") }
    assert(got.values.map(_._2).sum > got.values.map(_._3).sum,
      "both budgets identical — the census cannot rank budgets")
    assert(got.values.map(_._3).sum > 0, "no 1h-late event — weak fixture")
  }

  test("q287 equals the driver-side windowed membership walk; inactive " +
    "members exist, no dimension is fully inactive, and the WINDOW is " +
    "load-bearing (all-history referencing is vacuous here)") {
    def keys(t: String, c: String) =
      T(spark, dir, t).select(c).collect().map(_.getLong(0))
    def windowed(t: String, k: String, d: String): Set[Long] = {
      val rows = T(spark, dir, t).selectExpr(k, s"year($d)")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      val yr = rows.map(_._2).max
      rows.filter(_._2 == yr).map(_._1).toSet
    }
    val facts = Map(
      "customer" -> (keys("customer", "c_custkey"),
        windowed("orders", "o_custkey", "o_orderdate")),
      "part" -> (keys("part", "p_partkey"),
        windowed("lineitem", "l_partkey", "l_shipdate")),
      "supplier" -> (keys("supplier", "s_suppkey"),
        windowed("lineitem", "l_suppkey", "l_shipdate")))
    val want = facts.map { case (d, (members, act)) =>
      val m = members.length.toLong
      val r = members.count(act).toLong
      d -> (m, r, m - r, r * 10000 / m) }
    val got = graft.SparkEntry.queries("q287_dim_usage")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap
    assert(got == want)
    assert(got.values.exists(_._3 > 0), "no inactive member — census untested")
    assert(got.values.forall(_._2 > 0), "a dimension is fully inactive")
    // the window is the point: all-history referencing finds NOTHING
    // on this generator (every member referenced) — if that ever stops
    // holding, the windowed census's motivation weakens; surface it
    val allRef = keys("customer", "c_custkey")
      .forall(keys("orders", "o_custkey").toSet)
    assert(allRef, "generator now leaves all-history orphans — " +
      "reconsider the census window rationale")
  }
}
