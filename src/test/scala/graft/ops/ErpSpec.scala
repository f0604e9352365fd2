package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q259/q260/q261 beyond their DuckDB oracles: independent driver-side
  * recomputes (MessageDigest rates and archive tickets, literal 4-4-5
  * arithmetic, sequential gap scan), plus the semantic pins — sparse
  * months really resolve to an EARLIER published rate, periods are
  * whole weeks, gaps reconstruct the purged set exactly. */
class ErpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def md5Long(s: String, hexDigits: Int): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(hexDigits), 16)
  }

  test("q259 equals the driver-side as-of conversion; sparse months " +
    "genuinely resolve backward") {
    val orders = T(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("mi"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val region = T(spark, dir, "customer").select("c_custkey", "c_nationkey")
      .join(T(spark, dir, "nation").select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val lo = orders.map(_._2).min
    val hi = orders.map(_._2).max
    def pub(rk: Int, mi: Int): Option[Long] =
      if (mi == lo || mi % 2 == 1)
        Some(8000L + md5Long(s"fx:$rk:$mi", 12) % 4000L)
      else None
    // resolve forward-carry per currency
    val resolved: Map[(Int, Int), Long] = (0 to 4).flatMap { rk =>
      var cur = 0L
      (lo to hi).map { mi =>
        pub(rk, mi).foreach(cur = _)
        (rk, mi) -> cur
      }
    }.toMap
    val want = orders.groupBy { case (ck, mi, _) => (region(ck), mi) }
      .map { case ((rk, mi), rows) =>
        val rate = resolved((rk, mi))
        (s"CUR$rk", mi) -> (rows.length.toLong, rows.map(_._3).sum, rate,
          rows.map(r => r._3 * rate / 10000L).sum)
      }
    val got = graft.SparkEntry.queries("q259_currency_convert")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) => assert(got(k) == w, s"cell $k diverged") }
    // the as-of is load-bearing: some even (unpublished) month must
    // carry a rate that differs from what publishing it would have set
    val backward = (0 to 4).flatMap { rk =>
      (lo to hi).filter(mi => pub(rk, mi).isEmpty)
        .map(mi => resolved((rk, mi)) !=
          8000L + md5Long(s"fx:$rk:$mi", 12) % 4000L)
    }
    assert(backward.exists(identity),
      "every unpublished month coincidentally matches — as-of untested")
  }

  test("q260 equals the literal 4-4-5 walk; periods are whole weeks " +
    "and 12 per year") {
    val rows = T(spark, dir, "orders")
      .select(expr(s"datediff(cast(o_orderdate as date), " +
          s"date'${Erp.FiscalEpoch}')").as("di"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    def fyfp(di: Int): (Long, Long) = {
      val fy = 1990L + di / 364
      val w = (di % 364) / 7
      val q = w / 13
      val p = if (w % 13 < 4) 1 else if (w % 13 < 8) 2 else 3
      (fy, q * 3 + p)
    }
    val want = rows.groupBy(r => fyfp(r._1))
      .map { case (k, rs) => k -> (rs.length.toLong, rs.map(_._2).sum) }
    val got = graft.SparkEntry.queries("q260_fiscal_calendar")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(got.keys.map(_._2).forall(p => p >= 1 && p <= 12))
    assert(got.keys.map(_._1).toSet.size >= 2, "fixture spans one fiscal year")
    // period lengths by construction: weeks 0-3 → p1 of the quarter —
    // verify the 4-4-5 split on a synthetic year of day indices
    val periods = (0 until 364).map(fyfp).groupBy(identity)
      .map { case ((_, p), ds) => p -> ds.size / 7 }
    assert(periods == Map(1 -> 4, 2 -> 4, 3 -> 5, 4 -> 4, 5 -> 4, 6 -> 5,
      7 -> 4, 8 -> 4, 9 -> 5, 10 -> 4, 11 -> 4, 12 -> 5).map {
        case (k, v) => (k.toLong, v) })
  }

  test("q262 equals the driver-side aging walk; every bucket fires") {
    val cutoff = T(spark, dir, "orders")
      .agg(max(expr("cast(o_orderdate as date)"))).collect()(0)
      .getDate(0).toLocalDate
    val seg = T(spark, dir, "customer").select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = T(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"), expr("cast(o_orderdate as date)"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect()
      .map { r =>
        val age = java.time.temporal.ChronoUnit.DAYS
          .between(r.getDate(1).toLocalDate, cutoff)
        val b = if (age <= 30) "a_0_30" else if (age <= 60) "b_31_60"
          else if (age <= 90) "c_61_90" else "d_90_plus"
        ((seg(r.getLong(0)), b), r.getLong(2))
      }
      .groupBy(_._1)
      .map { case (k, rs) => k -> (rs.length.toLong, rs.map(_._2).sum) }
    val got = graft.SparkEntry.queries("q262_ar_aging")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(got.keys.map(_._2).toSet ==
      Set("a_0_30", "b_31_60", "c_61_90", "d_90_plus"),
      "not every aging bucket fires — weak fixture")
  }

  test("q263 YoY joins each period to last year's same period; both " +
    "variance signs appear (negative truncation exercised)") {
    val per = graft.SparkEntry.queries("q260_fiscal_calendar")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val got = graft.SparkEntry.queries("q263_fiscal_yoy")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    got.foreach { case (fy, fp, rev, prior, bp) =>
      assert(rev == per((fy, fp)))
      assert(prior == per((fy - 1, fp)))
      assert(bp == (rev - prior) * 10000 / prior)
    }
    val expected = per.keys.filter(k => per.contains((k._1 - 1, k._2)))
    assert(got.length == expected.size)
    assert(got.exists(_._5 > 0) && got.exists(_._5 < 0),
      "variance has one sign only — negative truncation untested")
  }

  test("q264 conserves every penny: per-order allocations sum to the " +
    "fee exactly, each within 1 of the exact share") {
    val rows = graft.SparkEntry.queries("q264_penny_allocation")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byOrder = rows.groupBy(_._1)
    val li = T(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("cast(round(l_extendedprice * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)) // line-NUMBER grain (the op's contract)
      .map { case ((ok, ln), rs) => (ok, ln, rs.map(_._3).sum) }
      .groupBy(_._1)
    byOrder.foreach { case (ok, allocs) =>
      val fee = allocs.head._3
      assert(allocs.map(_._4).sum == fee, s"order $ok leaks pennies")
      val ws = li(ok).map(l => (l._2, l._3)).toMap
      val tot = ws.values.sum
      allocs.foreach { case (_, ln, _, a) =>
        val base = fee * ws(ln) / tot
        assert(a == base || a == base + 1,
          s"order $ok line $ln alloc $a not within 1 of share $base")
      }
    }
    val topUps = byOrder.exists { case (ok, allocs) =>
      val ws = li(ok).map(l => (l._2, l._3)).toMap
      val tot = ws.values.sum
      val fee = allocs.head._3
      allocs.exists { case (_, ln, _, a) => a == fee * ws(ln) / tot + 1 }
    }
    assert(topUps, "no remainder penny ever distributed — Hamilton untested")
  }

  test("q261 gap islands reconstruct the purged key set exactly") {
    val all = T(spark, dir, "orders").select("o_orderkey")
      .collect().map(_.getLong(0)).sorted
    val kept = all.filter(k => md5Long(s"arch:$k", 12) % 5 != 0)
    val purged = all.filter(k => md5Long(s"arch:$k", 12) % 5 == 0).toSet
    assert(purged.nonEmpty && kept.nonEmpty)
    val got = graft.SparkEntry.queries("q261_gap_ranges")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential reference scan
    val want = kept.sliding(2).collect {
      case Array(a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.toSeq
    assert(got.toSeq == want)
    // the islands enumerate exactly the purged keys INSIDE the kept span
    val enumerated = got.flatMap { case (s0, e0, _) => s0 to e0 }.toSet
    val interior = purged.filter(k => k > kept.head && k < kept.last)
    assert(enumerated == interior)
    assert(got.exists(_._3 > 1), "no multi-key gap island — weak fixture")
  }
}
