package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q216 (cascade-delete audit) beyond the DuckDB oracle (same cohort
  * SQL): a driver-side brute force that recomputes the erasure cohort
  * from raw md5 (MessageDigest, not Spark's) and walks the FK graph by
  * hand — the walk itself encodes the closure contract (a lineitem is
  * deleted iff its order is, an order iff its customer is) — plus the
  * account-balance and genuine-verdict-mix properties per table. */
class CascadeDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def lng(r: org.apache.spark.sql.Row, c: String): Long =
    r.getAs[Number](c).longValue

  /** Independent md5 ticket: hex prefix via MessageDigest, not Spark. */
  private def deleted(custkey: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"del:$custkey".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16) % 16 == 0
  }

  private lazy val got: Map[String, (Long, Long, Long)] =
    Governance.q216CascadeDelete(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("q216 equals the driver-side FK walk with an independent md5") {
    val cust = T(spark, dir, "customer").select("c_custkey").collect()
      .map(lng(_, "c_custkey"))
    val delC = cust.filter(deleted).toSet
    val orders = T(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .collect().map(r => (lng(r, "o_orderkey"), lng(r, "o_custkey")))
    val delO = orders.collect { case (ok, ck) if delC(ck) => ok }.toSet
    val li = T(spark, dir, "lineitem").select("l_orderkey").collect()
      .map(lng(_, "l_orderkey"))
    val ev = T.events(spark, dir).select("user_id").collect()
      .map(lng(_, "user_id"))

    assert(got("customer") ==
      ((cust.length.toLong, delC.size.toLong, (cust.length - delC.size).toLong)))
    val oDel = orders.count(o => delO(o._1)).toLong
    assert(got("orders") == ((orders.length.toLong, oDel, orders.length - oDel)))
    val lDel = li.count(delO).toLong
    assert(got("lineitem") == ((li.length.toLong, lDel, li.length - lDel)))
    val eDel = ev.count(delC).toLong
    assert(got("events") == ((ev.length.toLong, eDel, ev.length - eDel)))
  }

  test("governance properties: every table has both deleted and kept " +
    "rows, and the account balances") {
    assert(got.size == 4)
    got.foreach { case (t, (n, d, k)) =>
      assert(d + k == n, t)
      assert(d > 0L, s"$t: cohort deletes nothing — fixture degenerate")
      assert(k > 0L, s"$t: cohort deletes everything")
    }
  }
}
