package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q183 CDC compaction: tombstone and update semantics spot-pinned
  * driver-side, the aggregate-not-window plan shape, and idempotence
  * (compacting an already-compacted snapshot's log is the identity —
  * the property that lets the job run on any cadence). */
class CdcCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val got =
    Curation.q183CdcCompact(spark, SparkTestBase.Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("tombstoned keys are gone; updated keys carry the new value") {
    val base = T(spark, SparkTestBase.Sf0001, "orders")
      .selectExpr("o_orderkey", "cast(round(o_totalprice * 100) as bigint)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    base.foreach { case (k, cents) =>
      if (k % 7 == 0) assert(!got.contains(k), s"tombstoned $k present")
      else {
        val (nOps, price) = got(k)
        val wantOps = 1 + (if (k % 5 == 0) 1 else 0)
        assert(nOps == wantOps, s"key $k n_ops")
        val want = if (k % 5 == 0) cents + 1000 else cents
        assert(price == want, s"key $k price")
      }
    }
  }

  test("compaction is one aggregate — no per-key window, no sort " +
    "before the aggregate") {
    val plan = Curation.q183CdcCompact(spark, SparkTestBase.Sf0001)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(plan.collect { case w: LWindow => w }.isEmpty, plan)
  }

  test("idempotence: a log of pure inserts of the snapshot compacts " +
    "to itself") {
    // feed the compacted snapshot back as an insert-only log through
    // the same max_by/filter shape
    import org.apache.spark.sql.functions._
    val snap = Curation.q183CdcCompact(spark, SparkTestBase.Sf0001)
      .select(col("o_orderkey").as("k"), col("price_c2"))
    val again = snap
      .select(col("k"), lit(0).as("seq"), lit("I").as("op"),
        col("price_c2"))
      .groupBy("k")
      .agg(max_by(col("op"), col("seq")).as("_op"),
        max_by(col("price_c2"), col("seq")).as("_p"))
      .filter(col("_op") =!= "D")
      .select(col("k"), col("_p").as("price_c2"))
    val a = again.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = snap.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
  test("q197 point-in-time lookup: every fact resolves EXACTLY one " +
    "version, and the resolved status is the fact's own status at its " +
    "date") {
    import org.apache.spark.sql.functions.col
    val dirr = SparkTestBase.Sf0001
    val facts = T(spark, dirr, "orders").count()
    val pit = Curation.q197Scd2Pit(spark, dirr).collect()
    assert(pit.length.toLong == facts,
      "PIT join must be exactly-one per fact (intervals partition time)")
    assert(pit.map(_.getLong(0)).distinct.length == pit.length)
    // brute-force semantic check: the version valid at an order's date
    // is the status of the LAST change at-or-before it (ties broken by
    // change orderkey — same-day flips resolve to the day's last)
    val orders = T(spark, dirr, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        org.apache.spark.sql.functions.unix_micros(
        col("o_orderdate").cast("timestamp")).as("tus"),
        col("o_orderstatus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val changes = orders.groupBy(_._2).map { case (ck, os) =>
      val sorted = os.sortBy(o => (o._3, o._1))
      val chg = sorted.foldLeft(List.empty[(Long, Long, String)]) {
        case (acc, (ok, _, ts, st)) =>
          if (acc.headOption.forall(_._3 != st)) (ok, ts, st) :: acc else acc
      }.reverse
      ck -> chg
    }
    val byKey = pit.map(r => r.getLong(0) ->
      (r.getString(2), r.getLong(4))).toMap
    orders.foreach { case (ok, ck, ts, _) =>
      val valid = changes(ck).filter(c => c._2 <= ts)
      val expect = valid.last // last change at-or-before the fact
      val (gotStatus, gotVer) = byKey(ok)
      assert(gotStatus == expect._3 && gotVer == expect._1,
        s"order $ok resolved ($gotStatus, $gotVer), want " +
          s"(${expect._3}, ${expect._1})")
    }
  }

}
