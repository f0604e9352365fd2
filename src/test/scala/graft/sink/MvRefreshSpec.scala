package graft.sink

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q203 (incremental aggregate maintenance) beyond the DuckDB oracle
  * (which proves merged == full recompute): the claims that make it a
  * REFRESH — the plan reads the new batch exactly once and the stored
  * MV instead of the base facts, and the stored MV is months-sized. */
class MvRefreshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("refresh equals the full recompute (merge loses and duplicates " +
    "nothing)") {
    val full = graft.ops.T(spark, dir, "orders")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_month")
      .collect().map(_.toSeq).toSeq
    val got = MvRefresh.q203MvRefresh(spark, dir).collect()
      .map(_.toSeq).toSeq
    assert(got == full)
    assert(got.nonEmpty)
  }

  test("the refresh plan reads ONE orders scan (the delta) plus the " +
    "stored MV — base facts are never re-aggregated") {
    val basePath = MvRefresh.ensureBaseAgg(spark, dir)
    // sparkPlan, not executedPlan: AQE's wrapper hides the scan leaves
    // from collect() until stages materialize
    val scans = MvRefresh.q203MvRefresh(spark, dir)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    val orderScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("orders.parquet")))
    val mvScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains(basePath)))
    assert(orderScans.size == 1,
      s"expected exactly one orders (delta) scan, got ${orderScans.size}")
    assert(mvScans.size == 1,
      s"expected exactly one stored-MV scan, got ${mvScans.size}")
  }

  test("the stored MV is months-sized (compact regardless of fact " +
    "volume) and both batches are non-empty") {
    val base = spark.read.parquet(MvRefresh.ensureBaseAgg(spark, dir))
    val months = graft.ops.T(spark, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct().count()
    assert(base.count() <= months)
    assert(base.count() > 0)
    // the REAL split expression — an inline copy would keep passing
    // against a stale constant if MvRefresh.batchTag ever changes
    val deltaRows = graft.ops.T(spark, dir, "orders")
      .filter(MvRefresh.batchTag >= 8).count()
    assert(deltaRows > 0, "degenerate split: empty delta batch")
    assert(base.agg(sum("n_orders")).first().getLong(0) > 0,
      "degenerate split: empty base batch")
  }

  test("q275 retraction equals the driver-side signed-weight walk; " +
    "decrements genuinely fire and insert+void keys net to zero") {
    val md = (s: String) => graft.SparkTestBase.md5Long(s, 12)
    val rows = graft.ops.T(spark, dir, "orders")
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val live = rows.filter(r => md(s"ret:${r._1}") % MvRefresh.RetractMod != 0)
    val want = live.groupBy(_._2).map { case (m, rs) =>
      m -> (rs.length.toLong, rs.map(_._3).sum) }
    val got = MvRefresh.q275MvRetract(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    // decrements fire: some month's count is strictly below the
    // append-only (q203) answer
    val appendOnly = MvRefresh.q203MvRefresh(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.exists { case (m, (n, _)) => n < appendOnly(m) },
      "no month ever decremented — retraction untested")
    // a batch-2 key hit by the ticket exists (insert + same-day void)
    val voided = graft.ops.T(spark, dir, "orders")
      .filter(MvRefresh.batchTag >= 8)
      .select("o_orderkey").collect().map(_.getLong(0))
      .filter(k => md(s"ret:$k") % MvRefresh.RetractMod == 0)
    assert(voided.nonEmpty, "no insert+void key — the net-zero path untested")
  }

  test("q275's plan reads the stored MV plus delta-sized order scans — " +
    "history is never re-aggregated") {
    val basePath = MvRefresh.ensureBaseAgg(spark, dir)
    val scans = MvRefresh.q275MvRetract(spark, dir)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    val orderScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("orders.parquet")))
    val mvScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains(basePath)))
    // two delta terms (inserts, tombstone images) — in production both
    // arrive on the CDC feed; the fixture derives them from the base
    assert(orderScans.size == 2,
      s"expected two delta-term scans, got ${orderScans.size}")
    assert(mvScans.size == 1,
      s"expected exactly one stored-MV scan, got ${mvScans.size}")
  }
}
