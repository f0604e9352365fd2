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
}
