package graft.ops

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
        Some(8000L + SparkTestBase.md5Long(s"fx:$rk:$mi", 12) % 4000L)
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
          8000L + SparkTestBase.md5Long(s"fx:$rk:$mi", 12) % 4000L)
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
    val kept = all.filter(k => SparkTestBase.md5Long(s"arch:$k", 12) % 5 != 0)
    val purged = all.filter(k => SparkTestBase.md5Long(s"arch:$k", 12) % 5 == 0).toSet
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

  test("q265 equals a sequential per-part FIFO walk; partial receipts " +
    "and value conservation hold") {
    val grain = T(spark, dir, "lineitem")
      .select(col("l_partkey"), expr("cast(l_shipdate as date)"),
        col("l_orderkey"), col("l_linenumber"),
        expr("cast(l_quantity as bigint)"),
        expr("cast(round(l_extendedprice * 100) as bigint)"))
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2),
        r.getInt(3)), (r.getLong(4), r.getLong(5))))
      .groupBy(_._1)
      .map { case (k, rs) =>
        (k, (rs.map(_._2._1).sum, rs.map(_._2._2).sum)) }
      .toSeq
    val want = grain.groupBy(_._1._1).map { case (pk, rows) =>
      // the literal sequential FIFO: walk the queue in order, consume
      val queue = rows.sortBy { case ((_, sd, ok, ln), _) =>
        (sd.toEpochDay, ok, ln.toLong) }.map(_._2)
      val recv = queue.map(_._1).sum
      var left = recv / 2 // demand
      var (issued, cogs, endQty, endV) = (0L, 0L, 0L, 0L)
      queue.foreach { case (q, c2) =>
        val take = math.max(0L, math.min(q, left))
        left -= take
        issued += take; cogs += c2 * take / q
        endQty += q - take; endV += c2 * (q - take) / q
      }
      pk -> (queue.size.toLong, recv, issued, cogs, endQty, endV)
    }
    val got = graft.SparkEntry.queries("q265_fifo_costing")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (pk, w) => assert(got(pk) == w, s"part $pk diverged") }
    // quantity conserves exactly; value conserves up to the floor split
    // (each receipt loses < 1¢ total across its two floored halves)
    got.foreach { case (pk, (n, recv, issued, cogs, endQty, endV)) =>
      assert(issued + endQty == recv, s"part $pk leaks quantity")
      assert(issued == recv / 2, s"part $pk demand not half of receipts")
      val totV = grain.filter(_._1._1 == pk).map(_._2._2).sum
      assert(cogs + endV <= totV)
      assert(totV - (cogs + endV) < n,
        s"part $pk floor loss exceeds 1¢ per receipt")
    }
    // a PARTIAL receipt (0 < consumed < qty) must exist or the interval
    // clamp never exercised its middle branch
    val partial = want.exists { case (pk, _) =>
      val rows = grain.filter(_._1._1 == pk)
      val queue = rows.sortBy { case ((_, sd, ok, ln), _) =>
        (sd.toEpochDay, ok, ln.toLong) }.map(_._2)
      var left = queue.map(_._1).sum / 2
      queue.exists { case (q, _) =>
        val take = math.max(0L, math.min(q, left)); left -= take
        take > 0 && take < q
      }
    }
    assert(partial, "no receipt ever partially consumed — clamp untested")
  }

  test("q266 classes equal the driver-side Pareto walk; all three " +
    "classes fire and shares account for the whole") {
    val rev = T(spark, dir, "lineitem")
      .select(col("l_partkey"),
        expr("cast(round(l_extendedprice * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (pk, rs) => (pk, rs.map(_._2).sum) }.toSeq
    val tot = rev.map(_._2).sum
    var run = 0L
    val cls = rev.sortBy { case (pk, r) => (-r, pk) }.map { case (pk, r) =>
      run += r
      val c = if (run * 100 <= tot * 80) "A"
        else if (run * 100 <= tot * 95) "B" else "C"
      (c, pk, r)
    }
    val want = cls.groupBy(_._1).map { case (c, rs) =>
      c -> (rs.length.toLong, rs.map(_._3).sum,
        rs.map(_._3).sum * 10000 / tot) }
    val got = graft.SparkEntry.queries("q266_abc_class")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(got.keySet == Set("A", "B", "C"), "a class is empty — weak fixture")
    // ranking is load-bearing: the head's average per-part revenue
    // strictly exceeds the tail's (guaranteed by the desc sort; TPC-H
    // part revenue is near-uniform, so A-has-fewer-parts need not hold)
    assert(got("A")._2 * got("C")._1 > got("C")._2 * got("A")._1,
      "class A average revenue does not exceed class C — ordering broken")
    assert(got.values.map(_._1).sum == rev.length.toLong)
    assert(got.values.map(_._2).sum == tot)
  }

  test("q267 equals the driver-side ticket walk; every status fires and " +
    "the 200 bp tolerance is load-bearing") {
    val li = T(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("cast(l_quantity as bigint)"),
        expr("cast(round(l_extendedprice * 100) as bigint)"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
      .map { case ((ok, ln), rs) =>
        (ok, ln, rs.map(_._2._1).sum, rs.map(_._2._2).sum) }
      .toSeq
    case class L(status: String, poC2: Long, ivC2: Long, shortQ: Long,
                 deltaBp: Long)
    val lines = li.map { case (ok, ln, poQty, poC2) =>
      val tk = SparkTestBase.md5Long(s"3wm:$ok:$ln", 12)
      val short = math.min(if (tk % 10 == 0) 1 + (tk / 10) % 3 else 0L, poQty)
      val bp = if ((tk / 100) % 8 == 0) 100 + (tk / 1000) % 400 else 0L
      val sign = if ((tk / 1000000) % 2 == 0) 1L else -1L
      val ivC2 = poC2 + (if (bp == 0) 0L else sign * (poC2 * bp / 10000))
      val qtyBad = short > 0
      val priceBad = math.abs(ivC2 - poC2) * 10000 > 200 * poC2
      val st = if (qtyBad && priceBad) "both" else if (qtyBad) "qty_short"
        else if (priceBad) "price_var" else "ok"
      L(st, poC2, ivC2, short, bp)
    }
    val want = lines.groupBy(_.status).map { case (st, rs) =>
      st -> (rs.length.toLong, rs.map(_.poC2).sum, rs.map(_.ivC2).sum,
        rs.map(_.shortQ).sum) }
    val got = graft.SparkEntry.queries("q267_three_way_match")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap
    assert(got == want)
    assert(got.keySet == Set("ok", "qty_short", "price_var", "both"),
      "a match status never fires — weak fixture")
    // tolerance is load-bearing: some line carries a nonzero invoice
    // variance yet still matches (its floored bp landed <= 200)
    assert(lines.exists(l => l.deltaBp > 0 && l.status == "ok"),
      "no sub-tolerance variance — the 200 bp gate is untested")
    assert(lines.exists(l => l.deltaBp > 0 && l.deltaBp <= 200),
      "ticket range never lands in-tolerance")
  }

  test("q274 equals the driver-side index walk; indices straddle the " +
    "10000 average and sum back to ~120000 per segment") {
    val seg = T(spark, dir, "customer").select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = T(spark, dir, "orders")
      .select(col("o_custkey"), expr("month(o_orderdate)"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (seg(r.getLong(0)), r.getInt(1), r.getLong(2)))
    val want = rows.groupBy(r => (r._1, r._2)).map { case ((sg, m), rs) =>
      (sg, m) -> (rs.length.toLong, rs.map(_._3).sum) }
    val totals = rows.groupBy(_._1).map { case (sg, rs) =>
      sg -> rs.map(_._3).sum }
    val got = graft.SparkEntry.queries("q274_seasonal_index")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case ((sg, m), (n, rev, bp)) =>
      assert((n, rev) == want((sg, m)), s"cell ($sg, $m)")
      assert(bp == rev * 12 * 10000 / totals(sg), s"index ($sg, $m)")
    }
    // seasonality is visible: some month above and some below average
    assert(got.values.exists(_._3 > 10000) && got.values.exists(_._3 < 10000))
    // indices are shares ×12: per segment they sum to 120000 minus the
    // per-month truncation (< 12 bp total)
    got.keys.map(_._1).toSeq.distinct.foreach { sg =>
      val s12 = got.collect { case ((g, _), (_, _, bp)) if g == sg => bp }.sum
      assert(s12 <= 120000L && s12 > 120000L - 12, s"segment $sg sums to $s12")
    }
  }

  test("q277 equals the driver-side close-calendar walk; carried and " +
    "in-period documents both fire, restated months never appear") {
    val rows = T(spark, dir, "orders")
      .select(col("o_orderkey"), expr("cast(o_orderdate as date)"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect()
      .map { r =>
        val ok = r.getLong(0)
        val dd = r.getDate(1).toLocalDate
        val tk = SparkTestBase.md5Long(s"late:$ok", 12)
        val late = if (tk % 20 < 3) 1 + (tk / 100) % 40 else 0L
        val arrival = dd.plusDays(late)
        val deadline = dd.withDayOfMonth(dd.lengthOfMonth())
          .plusDays(Erp.GraceDays.toLong)
        val pm = if (!arrival.isAfter(deadline))
          f"${dd.getYear}%04d-${dd.getMonthValue}%02d"
        else f"${arrival.getYear}%04d-${arrival.getMonthValue}%02d"
        val dm = f"${dd.getYear}%04d-${dd.getMonthValue}%02d"
        (pm, pm != dm, r.getLong(2))
      }
    val want = rows.groupBy(_._1).map { case (m, rs) =>
      m -> (rs.length.toLong, rs.count(_._2).toLong, rs.map(_._3).sum) }
    val got = graft.SparkEntry.queries("q277_posting_period")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(rows.exists(_._2) && rows.exists(!_._2),
      "carry-in never fires (or always fires) — the grace gate untested")
    // a late-but-within-grace document must exist: lateness alone must
    // NOT imply a carry (the grace window is load-bearing)
    val withinGrace = T(spark, dir, "orders")
      .select(col("o_orderkey"), expr("cast(o_orderdate as date)"))
      .collect().exists { r =>
        val dd = r.getDate(1).toLocalDate
        val tk = SparkTestBase.md5Long(s"late:${r.getLong(0)}", 12)
        val late = if (tk % 20 < 3) 1 + (tk / 100) % 40 else 0L
        val deadline = dd.withDayOfMonth(dd.lengthOfMonth())
          .plusDays(Erp.GraceDays.toLong)
        late > 0 && !dd.plusDays(late).isAfter(deadline)
      }
    assert(withinGrace, "no late-but-within-grace document — weak fixture")
  }

  test("q279 equals the driver-side HHI walk; concentration spans the " +
    "spectrum (no single-value report)") {
    val brand = T(spark, dir, "part").select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vols = T(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100) as bigint)"))
      .collect().map(r => ((brand(r.getLong(0)), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sum }
    val want = vols.groupBy(_._1._1).map { case (b, sup) =>
      val tot = sup.values.sum
      val shares = sup.values.map(v => v * 10000 / tot)
      b -> (sup.size.toLong, shares.max,
        shares.map(s => s * s).sum / 10000)
    }
    val got = graft.SparkEntry.queries("q279_supplier_hhi")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (b, (n, top, hhi)) =>
      assert(got(b) == ((n, top, hhi, hhi > 2500L)), s"brand $b")
    }
    // HHI must vary across brands or the report is a constant
    assert(got.values.map(_._3).toSeq.distinct.size > 1)
    // atomization sanity: a brand with many suppliers has HHI below
    // the single-source ceiling
    assert(got.values.exists { case (n, _, hhi, _) => n >= 5 && hhi < 2500 })
  }

  test("q281 equals the driver-side repeat-curve walk; the curve is " +
    "monotone non-increasing and conversion is genuinely partial") {
    val counts = T(spark, dir, "orders").select("o_custkey")
      .collect().map(_.getLong(0))
      .groupBy(identity).map(_._2.size.toLong)
    val maxN = counts.max
    val want = (1L to maxN).map { n =>
      val at = counts.count(_ >= n).toLong
      val nxt = counts.count(_ >= n + 1).toLong
      (n, at, nxt * 10000 / at)
    }
    val got = graft.SparkEntry.queries("q281_repeat_curve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse,
      "customers-at-n is not non-increasing — explode lowering broken")
    assert(got.exists(r => r._3 > 0 && r._3 < 10000),
      "no partial conversion step — degenerate curve")
    assert(got.last._3 == 0L, "the last step must convert nobody")
  }

  test("q282 bridge conserves exactly per brand (vol + price + residual " +
    "== delta revenue) and equals the driver walk") {
    val brand = T(spark, dir, "part").select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val year = T(spark, dir, "orders")
      .selectExpr("o_orderkey", "year(o_orderdate)")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val by = T(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "cast(l_quantity as bigint)",
        "cast(round(l_extendedprice * 100) as bigint)")
      .collect()
      .map(r => ((brand(r.getLong(1)), year(r.getLong(0))),
        (r.getLong(2), r.getLong(3))))
      .filter(r => r._1._2 == Erp.PvmY1 || r._1._2 == Erp.PvmY2)
      .groupBy(_._1)
      .map { case (k, rs) =>
        k -> (rs.map(_._2._1).sum, rs.map(_._2._2).sum) }
    val want = by.keys.map(_._1).toSeq.distinct.sorted.flatMap { b =>
      (by.get((b, Erp.PvmY1)), by.get((b, Erp.PvmY2))) match {
        case (Some((q1, r1)), Some((q2, r2))) =>
          val (p1, p2) = (r1 / q1, r2 / q2)
          val vol = (q2 - q1) * p1
          val price = (p2 - p1) * q2
          Some((b, r1, r2, vol, price, (r2 - r1) - vol - price))
        case _ => None
      }
    }
    val got = graft.SparkEntry.queries("q282_price_volume_mix")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    got.foreach { case (b, r1, r2, vol, price, res) =>
      assert(vol + price + res == r2 - r1, s"brand $b bridge leaks")
    }
    assert(got.exists(_._4 != 0L) && got.exists(_._5 != 0L),
      "an effect is identically zero — degenerate bridge")
  }

  test("q283 equals the driver-side elimination walk; intra-group trade " +
    "exists and gross == eliminated + net") {
    val custN = T(spark, dir, "customer").select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val region = T(spark, dir, "nation").select("n_nationkey", "n_regionkey")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val suppN = T(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ordC = T(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = T(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey",
        "cast(round(l_extendedprice * 100) as bigint)")
      .collect().map { r =>
        val cn = custN(ordC(r.getLong(0)))
        (region(cn), suppN(r.getLong(1)) == cn, r.getLong(2))
      }
    val want = rows.groupBy(_._1).map { case (rg, rs) =>
      val g = rs.map(_._3).sum
      val e = rs.filter(_._2).map(_._3).sum
      rg -> (rs.length.toLong, g, e, g - e, e * 10000 / g) }
    val got = graft.SparkEntry.queries("q283_ic_elimination")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    got.foreach { case (rg, (_, g, e, n, _)) =>
      assert(g == e + n, s"region $rg does not reconcile") }
    assert(got.values.exists(_._3 > 0),
      "no intra-group trade — elimination untested")
    assert(got.values.forall(v => v._3 < v._2),
      "a region is ALL intra-group — degenerate")
  }

  /** The SQL-ntile layout over an already-sorted sequence: first
    * N mod n buckets get one extra row (ScalableRank.withNtile's
    * contract, recomputed independently). */
  private def ntileOf(rank1: Int, total: Int, n: Int): Int = {
    val q = total / n
    val r = total % n
    val bigCut = r * (q + 1)
    if (rank1 <= bigCut) (rank1 - 1) / (q + 1) + 1
    else r + (rank1 - bigCut - 1) / math.max(q, 1) + 1
  }

  test("q268 equals the driver-side quintile walk; the segment ladder " +
    "covers the fixture") {
    val cutoff = T(spark, dir, "orders")
      .agg(max(expr("cast(o_orderdate as date)"))).collect()(0)
      .getDate(0).toLocalDate
    val base = T(spark, dir, "orders")
      .select(col("o_custkey"), expr("cast(o_orderdate as date)"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
      .map { case (ck, rs) =>
        val rec = java.time.temporal.ChronoUnit.DAYS
          .between(rs.map(_._2).maxBy(_.toEpochDay), cutoff)
        (ck, rec, rs.length.toLong, rs.map(_._3).sum)
      }.toSeq
    val nCust = base.length
    def scores(key: ((Long, Long, Long, Long)) => (Long, Long),
               desc: Boolean): Map[Long, Int] = {
      val sorted = base.map(c => (c._1, key((c._1, c._2, c._3, c._4))))
        .sortBy { case (ck, (v, _)) => (if (desc) -v else v, ck) }
      sorted.zipWithIndex.map { case ((ck, _), i) =>
        ck -> ntileOf(i + 1, nCust, 5) }.toMap
    }
    val rS = scores(c => (c._2, c._1), desc = true)  // recency DESC
    val fS = scores(c => (c._3, c._1), desc = false) // freq ASC
    val mS = scores(c => (c._4, c._1), desc = false) // monetary ASC
    def seg(r: Int, f: Int, m: Int): String =
      if (r >= 4 && f >= 4 && m >= 4) "champion"
      else if (r >= 4 && f >= 4) "loyal"
      else if (r >= 4) "promising"
      else if (f >= 4) "at_risk"
      else if (r <= 2 && f <= 2) "hibernating"
      else "regular"
    val want = base.groupBy(c => seg(rS(c._1), fS(c._1), mS(c._1)))
      .map { case (sg, cs) => sg -> (cs.length.toLong, cs.map(_._2).sum,
        cs.map(_._3).sum, cs.map(_._4).sum) }
    val got = graft.SparkEntry.queries("q268_rfm_segments")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap
    assert(got == want)
    assert(got.keySet.size >= 4,
      s"only ${got.keySet} segments fire — ladder mostly dead on fixture")
    assert(got.values.map(_._1).sum == nCust.toLong)
  }

  test("q269 equals the driver-side SLA walk; late and on-time orders " +
    "both exist and the span is nonzero somewhere") {
    val ship = T(spark, dir, "lineitem")
      .select(col("l_orderkey"), expr("cast(l_shipdate as date)"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1)
      .map { case (ok, rs) =>
        ok -> (rs.map(_._2).minBy(_.toEpochDay), rs.map(_._2).maxBy(_.toEpochDay)) }
    val rows = T(spark, dir, "orders")
      .select(col("o_orderkey"), expr("cast(o_orderdate as date)"),
        col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
      .filter(r => ship.contains(r._1))
      .map { case (ok, od, pr) =>
        val (fs, ls) = ship(ok)
        val lead = java.time.temporal.ChronoUnit.DAYS.between(od, fs)
        val span = java.time.temporal.ChronoUnit.DAYS.between(fs, ls)
        val sla = 15 + 15 * pr.substring(0, 1).toInt
        (pr, lead, span, lead > sla)
      }
    val want = rows.groupBy(_._1).map { case (pr, rs) =>
      pr -> (rs.length.toLong, rs.count(_._4).toLong,
        rs.count(_._4).toLong * 10000 / rs.length,
        rs.map(_._2).sum, rs.map(_._3).sum) }
    val got = graft.SparkEntry.queries("q269_fulfillment_cycle")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    assert(rows.exists(_._4) && rows.exists(!_._4),
      "SLA gate fires one way only — threshold untested")
    assert(rows.exists(_._3 > 0), "no multi-day ship span — weak fixture")
    got.foreach { case (pr, (n, late, bp, _, _)) =>
      assert(bp == late * 10000 / n, s"priority $pr bp arithmetic")
    }
  }

  test("q298 posting run ties out to acquisition cost to the cent; " +
    "the remainder posts in the final month") {
    val costs = T(spark, dir, "orders")
      .select(expr("year(o_orderdate) * 12 + month(o_orderdate) - 1"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val got = graft.SparkEntry.queries("q298_depreciation")(spark, dir)
      .collect()
      .map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4))).toMap
    // global conservation: the full run posts exactly the capitalized
    // cents, no penny lost to the monthly floor
    assert(got.values.map(_._2).sum == costs.map(_._2).sum,
      "depreciation run != total acquisition cost")
    // driver recompute of the whole run (tiny: months x assets grid)
    val L = Erp.DepLifeMonths
    val want = costs.flatMap { case (mi0, cost) =>
      (0 until L).map { m =>
        (mi0 + m).toLong ->
          (if (m < L - 1) cost / L else cost - (L - 1) * (cost / L))
      }
    }.groupBy(_._1).map { case (mi, rows) =>
      mi -> (rows.length.toLong, rows.map(_._2).sum)
    }
    assert(got == want, "posting run diverged from the driver walk")
    // the remainder month is visibly lumpier than the steady months on
    // at least one boundary (non-vacuous remainder)
    assert(costs.exists(_._2 % L != 0), "every cost divisible — degenerate")
  }

  test("q299 equals a sequential per-part moving-average walk; the " +
    "empty-stock guard and a genuine MAP refloor both fire") {
    val rows = T(spark, dir, "lineitem")
      .select(col("l_partkey"), expr("cast(l_shipdate as date)").as("sd"),
        col("l_orderkey"), col("l_linenumber"),
        expr("cast(l_quantity as bigint)").as("q0"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c0"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5)))
    val byKey = rows.groupBy(t => (t._1, t._2, t._3, t._4))
      .map { case (k, g) => (k, g.map(_._5).sum, g.map(_._6).sum) }
    var guardFired = false
    var refloored = false
    val want = byKey.groupBy(_._1._1).map { case (part, evs) =>
      var q = 0L; var v = 0L; var iss = 0L; var cogs = 0L
      var lastMap = -1L
      evs.toSeq.sortBy(e => (e._1._2, e._1._3, e._1._4)).foreach {
        case ((_, _, _, ln), qs, cs) =>
          if (ln % 2 == 1) { q += qs; v += cs }
          else if (q <= 0L) guardFired = true
          else {
            val out = math.min(qs / 2, q); val m = v / q
            if (lastMap >= 0 && m != lastMap) refloored = true
            lastMap = m
            v -= out * m; q -= out; iss += out; cogs += out * m
          }
      }
      part -> (evs.size.toLong, q, v, if (q > 0) v / q else 0L, iss, cogs)
    }
    val got = graft.SparkEntry.queries("q299_avg_costing")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == want, "graded fold diverged from the sequential walk")
    assert(refloored, "MAP never moved between issues — fold untested")
    // conservation: received value = ending value + COGS + the floored
    // remainders (each issue floors once, so the residue is bounded)
    got.foreach { case (part, (_, _, endv, _, _, cogs)) =>
      val recv = byKey.collect {
        case ((p, _, _, ln), _, cs) if p == part && ln % 2 == 1 => cs
      }.sum
      assert(endv + cogs <= recv, s"part $part created value")
    }
  }

  test("q300 equals the driver-side greedy budget walk; the cut fires " +
    "mid-tier (take and skip both present)") {
    val inv = T(spark, dir, "orders").filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .collect().map { r =>
        val ok = r.getLong(0)
        val tk = SparkTestBase.md5Long(s"cd:$ok", 12)
        val bp = Erp.CdTiersBp((tk % 3).toInt)
        (ok, r.getLong(1), bp)
      }
    val budget = inv.map(_._2).sum / 10
    // prefix semantics: the cumulative counts EVERY invoice in rank
    // order, so the first non-fit provably ends the run (cs only
    // grows) — the take set is the longest greedy prefix that fits,
    // never a first-fit packer
    var cs = 0L
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    inv.sortBy(t => (-t._3, t._2, t._1)).foreach { case (_, cents, bp) =>
      val take = cs + cents <= budget
      cs += cents
      val (nt, ns, tc, sv) = want.getOrElse(bp, (0L, 0L, 0L, 0L))
      want(bp) =
        if (take) (nt + 1, ns, tc + cents, sv + cents * bp / 10000)
        else (nt, ns + 1, tc, sv)
    }
    val got = graft.SparkEntry.queries("q300_cash_discount")(spark, dir)
      .collect() // disc_bp is an interpolated int literal → INT column
      .map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == want.toMap, "greedy take diverged from the driver walk")
    assert(got.values.exists(t => t._1 > 0 && t._2 > 0),
      "no tier has both taken and skipped — the cut never bit mid-tier")
  }

  test("q301 equals the textbook Gini formula per region; regions " +
    "genuinely disperse") {
    val rev = T(spark, dir, "lineitem")
      .select(col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c2"))
      .groupBy("l_suppkey").agg(sum("c2").as("rev"))
      .join(T(spark, dir, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(T(spark, dir, "nation").select("n_nationkey", "n_regionkey"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey"), col("l_suppkey"), col("rev"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val want = rev.groupBy(_._1).map { case (region, rows) =>
      val xs = rows.sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length
      val num = xs.zipWithIndex.map { case (x, i0) =>
        BigInt(2 * (i0 + 1) - n - 1) * x }.sum
      val tot = xs.map(BigInt(_)).sum
      region.toLong -> (n.toLong, tot.toLong,
        ((num * 10000) / (BigInt(n) * tot)).toLong)
    }
    val got = graft.SparkEntry.queries("q301_gini")(spark, dir)
      .collect()
      .map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got == want, "Gini diverged from the textbook walk")
    assert(got.values.map(_._3).toSet.size > 1,
      "all regions identical — dispersion untested")
  }

  test("q302 equals the driver-side escalation walk; the top level " +
    "fires and blocks") {
    val today = T(spark, dir, "orders")
      .agg(max(expr("cast(o_orderdate as date)"))).collect()(0)
      .getDate(0).toLocalDate
    val items = T(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"), expr("cast(o_orderdate as date)"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().flatMap { r =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(
          r.getDate(1).toLocalDate, today) - 30
        if (age <= 0) None
        else {
          val lvl = if (age <= Erp.DunLevels(0)._1) 1L
            else if (age <= Erp.DunLevels(1)._1) 2L else 3L
          val fee = Erp.DunLevels((lvl - 1).toInt)._2
          Some((r.getLong(0), lvl, r.getLong(2), fee))
        }
      }
    val want = items.groupBy(_._1).map { case (ck, g) =>
      (ck, g.map(_._2).max, g.length.toLong, g.map(_._3).sum, g.map(_._4).sum)
    }.groupBy(_._2).map { case (lvl, custs) =>
      lvl -> (custs.size.toLong, custs.map(_._3).sum, custs.map(_._4).sum,
        custs.map(_._5).sum, if (lvl == 3L) custs.size.toLong else 0L)
    }
    val got = graft.SparkEntry.queries("q302_dunning_run")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == want, "dunning run diverged from the escalation walk")
    assert(got.contains(3L) && got(3L)._5 > 0, "no blocked accounts")
    // the MAX-level escalation must be visible: some ITEM sits below
    // its customer's level (at sf0.001 every multi-level customer
    // escalates fully, so the per-level output alone can't show it)
    val custLvl = items.groupBy(_._1).map { case (ck, g) =>
      ck -> g.map(_._2).max }
    assert(items.exists(i => i._2 < custLvl(i._1)),
      "no item below its customer's level — escalation untested")
  }

  test("q303 equals the driver-side balance + future-min walk; " +
    "shortage and healthy windows both present") {
    val evs = T(spark, dir, "lineitem")
      .select(col("l_partkey"), expr("cast(l_shipdate as date)").as("sd"),
        col("l_orderkey"), col("l_linenumber"),
        expr("cast(l_quantity as bigint)").as("q0"))
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getInt(3)), r.getLong(4)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val want = evs.groupBy(_._1._1).flatMap { case (part, g) =>
      val ordered = g.toSeq.sortBy(t => (t._1._2, t._1._3, t._1._4))
        .map { case ((_, _, _, ln), qs) =>
          if (ln % 2 == 1) qs else -(qs / 2) }
      val bal = ordered.scanLeft(0L)(_ + _).tail
      val atp = bal.scanRight(Long.MaxValue)(math.min).init
      ordered.indices.map(i =>
        (part, (i + 1).toLong) ->
          (ordered(i), bal(i), atp(i), atp(i) < 0))
    }
    val got = graft.SparkEntry.queries("q303_atp")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == want, "ATP diverged from the driver walk")
    assert(got.values.exists(_._4), "no shortage window — untested")
    assert(got.values.exists(!_._4), "everything short — degenerate")
    // ATP never exceeds the balance, by definition of the future-min
    got.values.foreach { case (_, bal, atp, _) => assert(atp <= bal) }
  }
}
