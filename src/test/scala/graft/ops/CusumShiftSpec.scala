package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q255 beyond the DuckDB oracle (which states the same prefix-form
  * windows): the literal max(0, s+d) RECURRENCE re-run driver-side on
  * the real corpus (pinning the prefix-min identity the plan relies
  * on), plus synthetic level-shift / level-drop / stationary fixtures
  * through the graded core — the alarm must fire on sustained small
  * regime changes and stay silent on stationary data. */
class CusumShiftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def summarize(days: Seq[(Long, Long)]) // (day, cnt), sorted
      : (Long, Long, Long, Long, Long, Long, Long) = {
    val cnts = days.map(_._2)
    val med = cnts.sorted.apply((cnts.length + 1) / 2 - 1)
    val slack = med / 10
    val h = math.max(med, 1L)
    var sUp = 0L; var sDn = 0L
    var maxUp = 0L; var maxDn = 0L
    var nUp = 0L; var nDn = 0L
    var firstUp = -1L; var firstDn = -1L
    days.foreach { case (day, cnt) =>
      sUp = math.max(0L, sUp + (cnt - med - slack))
      sDn = math.max(0L, sDn + (med - slack - cnt))
      maxUp = math.max(maxUp, sUp); maxDn = math.max(maxDn, sDn)
      if (sUp > h) { nUp += 1; if (firstUp < 0) firstUp = day }
      if (sDn > h) { nDn += 1; if (firstDn < 0) firstDn = day }
    }
    (med, maxUp, maxDn, nUp, nDn, firstUp, firstDn)
  }

  test("q255 equals the literal CUSUM recurrence on the full corpus") {
    val DayUs = T.DayUs
    val counts = T.events(spark, dir)
      .select(col("event_type"), expr(s"(tus div $DayUs) * $DayUs").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = counts.groupBy(_._1).map { case (ty, rows) =>
      ty -> summarize(rows.map(r => (r._2, r._3)).sortBy(_._1).toSeq)
    }
    val got = graft.SparkEntry.queries("q255_cusum_shift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (ty, (med, mu, md2, nu, nd, fu, fd)) =>
      assert(got(ty) == (med, mu, md2, nu, nd, fu, fd), s"type $ty diverged")
    }
  }

  test("synthetic regimes: shift alarms up, drop alarms down, " +
    "stationary stays silent") {
    import spark.implicits._
    def mk(ty: String, cnts: Seq[Long]) =
      cnts.zipWithIndex.map { case (c, i) => (ty, (i + 1).toLong, c) }
    val in = (
      mk("flat", Seq.fill(40)(100L)) ++
      mk("shift", Seq.fill(30)(100L) ++ Seq.fill(10)(200L)) ++
      mk("drop", Seq.fill(30)(100L) ++ Seq.fill(10)(20L))
    ).toDF("event_type", "day", "cnt")
    val got = Corpus.cusumCore(in).collect()
      .map(r => r.getString(0) -> r).toMap

    val flat = got("flat")
    assert(flat.getAs[Long]("n_up") == 0L && flat.getAs[Long]("n_down") == 0L)
    assert(flat.getAs[Long]("first_up_day") == -1L)

    // shift: med=100, slack=10, h=100; +90/day from day 31 ⇒ splus
    // first exceeds 100 on day 32 (180), alarming days 32..40
    val shift = got("shift")
    assert(shift.getAs[Long]("med_cnt") == 100L)
    assert(shift.getAs[Long]("first_up_day") == 32L)
    assert(shift.getAs[Long]("n_up") == 9L)
    assert(shift.getAs[Long]("n_down") == 0L)

    // drop: deviation +70/day below band from day 31 ⇒ sminus crosses
    // 100 on day 32 (140)
    val drop = got("drop")
    assert(drop.getAs[Long]("first_down_day") == 32L)
    assert(drop.getAs[Long]("n_down") == 9L)
    assert(drop.getAs[Long]("n_up") == 0L)
  }

  test("a +30% sustained settle — no single MAD-outlier day — still " +
    "alarms (the case q202 structurally cannot flag)") {
    import spark.implicits._
    // 35 days at 100, then 25 days at 130: med stays 100, each post-
    // shift day deviates only +30 (3× MAD would need huge single-day
    // spikes), but the cumulative excess 20/day crosses h=100 fast
    val in = (Seq.fill(35)(100L) ++ Seq.fill(25)(130L))
      .zipWithIndex.map { case (c, i) => ("settle", (i + 1).toLong, c) }
      .toDF("event_type", "day", "cnt")
    val r = Corpus.cusumCore(in).collect()(0)
    assert(r.getAs[Long]("n_up") > 0L, "sustained settle must alarm")
    assert(r.getAs[Long]("first_up_day") == 41L) // ceil: 20/day past 100
  }
}
