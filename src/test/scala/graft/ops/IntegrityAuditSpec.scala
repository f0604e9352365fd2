package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q207 (bulk integrity audit) beyond the DuckDB oracle (same
  * constraint SQL): a full driver-side brute force of every constraint
  * from the raw rows, the genuine-mix requirement (both verdicts must
  * occur — an all-green audit proves nothing about the fail path), and
  * the one-sweep plan claim for the lineitem constraint block. */
class IntegrityAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def rows(t: String) = T(spark, dir, t).collect()

  /** Key columns vary between int32/int64 across testdata
    * regenerations — read numerically, not by boxed type. */
  private def lng(r: org.apache.spark.sql.Row, c: String): Long =
    r.getAs[Number](c).longValue

  private lazy val got: Map[String, (Long, Long, Boolean)] =
    Audit.q207IntegrityAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

  test("q207 equals the driver-side brute force on every constraint") {
    val li = rows("lineitem")
    val orders = rows("orders")
    val custKeys = rows("customer").map((r => lng(r, "c_custkey"))).toSet
    val partKeys = rows("part").map((r => lng(r, "p_partkey"))).toSet
    val suppKeys = rows("supplier").map((r => lng(r, "s_suppkey"))).toSet
    val ordByKey = orders.map(r =>
      lng(r, "o_orderkey") ->
        r.getAs[java.time.LocalDateTime]("o_orderdate")).toMap

    def c2(x: Double): Long = math.floor(x * 100.0 + 0.5).toLong

    assert(got("fk_lineitem_orderkey")._2 ==
      li.count(r => !ordByKey.contains(lng(r, "l_orderkey"))))
    assert(got("fk_lineitem_partkey")._2 ==
      li.count(r => !partKeys.contains(lng(r, "l_partkey"))))
    assert(got("fk_lineitem_suppkey")._2 ==
      li.count(r => !suppKeys.contains(lng(r, "l_suppkey"))))
    assert(got("fk_orders_custkey")._2 ==
      orders.count(r => !custKeys.contains(lng(r, "o_custkey"))))
    assert(got("fk_events_userid")._2 ==
      rows("events").count(r => !custKeys.contains(lng(r, "user_id"))))
    assert(got("rule_discount_range")._2 == li.count { r =>
      val d = r.getAs[Double]("l_discount"); d < 0.0 || d > 0.1
    })
    assert(got("rule_ship_after_order")._2 == li.count { r =>
      ordByKey.get(lng(r, "l_orderkey"))
        .exists(od => r.getAs[java.time.LocalDateTime]("l_shipdate").isBefore(od))
    })
    val liDupBad = li.groupBy(r =>
        (lng(r, "l_orderkey"), lng(r, "l_linenumber")))
      .valuesIterator.map(_.size).filter(_ > 1).sum.toLong
    assert(got("unique_lineitem_line")._2 == liDupBad)
    assert(got("unique_orders_orderkey")._2 ==
      orders.groupBy((r => lng(r, "o_orderkey")))
        .valuesIterator.map(_.size).filter(_ > 1).sum.toLong)
    val sums = li.groupBy(r => lng(r, "l_orderkey")).map { case (k, ls) =>
      k -> ls.map(r => c2(r.getAs[Double]("l_extendedprice")) *
        (100L - c2(r.getAs[Double]("l_discount"))) *
        (100L + c2(r.getAs[Double]("l_tax")))).sum
    }
    assert(got("reconcile_totalprice")._2 == orders.count { r =>
      sums.get(lng(r, "o_orderkey")) match {
        case None => true
        case Some(s) =>
          math.abs(c2(r.getAs[Double]("o_totalprice")) * 10000L - s) > 10000L
      }
    })
    assert(got("coverage_orders_lineitem")._2 ==
      orders.count(r => !sums.contains(lng(r, "o_orderkey"))))
    assert(got("fk_lineitem_orderkey")._1 == li.length.toLong)
    assert(got("reconcile_totalprice")._1 == orders.length.toLong)
  }

  test("genuine verdict mix: some constraints pass AND some fail " +
    "(an audit whose fail path never fires is untested)") {
    assert(got.values.exists(_._3), s"no passing constraint: $got")
    assert(got.values.exists(!_._3), s"no failing constraint: $got")
    got.foreach { case (c, (n, bad, ok)) =>
      assert(ok == (bad == 0L), c)
      assert(bad <= n, c)
    }
    assert(got.size == 11)
  }

  test("one sweep per child table: the five lineitem constraints share " +
    "a single lineitem scan in the plan") {
    // sparkPlan, not executedPlan: AQE's wrapper hides the scan leaves;
    // and PHYSICAL FileScans, not the optimized-plan string — logical
    // relations print no file path, so a path regex there matches zero
    // and asserts nothing
    val scans = Audit.q207IntegrityAudit(spark, dir)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scans.nonEmpty, "no file scans found — plan shape changed")
    val liScans = scans.count(
      _.relation.location.rootPaths.mkString.contains("lineitem"))
    // lineitem appears once for the FK/rule sweep (5 rows exploded from
    // ONE aggregate), once for the uniqueness group-by, once for the
    // reconciliation sum — never five times for five FK/rule constraints
    assert(liScans == 3, s"expected 3 physical lineitem scans, got $liScans")
  }
}
