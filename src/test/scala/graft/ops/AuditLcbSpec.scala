package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q280 (return-rate lower confidence bound) beyond the DuckDB oracle:
  * a BigInt exact-sqrt recompute of every cell, and the op's reason to
  * exist — some cell pair ranks differently by raw rate than by LCB
  * (the small-sample inversion the shrinkage + penalty produce). */
class AuditLcbSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def isqrt(y: Long): Long = {
    require(y >= 0)
    val r = java.math.BigInteger.valueOf(y).sqrt().longValueExact()
    assert(r * r <= y && (r + 1) * (r + 1) > y)
    r
  }

  test("q280 equals the BigInt-sqrt recompute; a raw-vs-LCB rank " +
    "inversion exists (the reason to rank by LCB at all)") {
    val brandSize = T(spark, dir, "part")
      .select("p_partkey", "p_brand", "p_size")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val cells = T(spark, dir, "lineitem")
      .select(col("l_partkey"), (col("l_returnflag") === "R").cast("long"))
      .collect().map(r => (brandSize(r.getLong(0)), r.getLong(1)))
      .groupBy(_._1)
      .map { case (k, rs) => k -> (rs.size.toLong, rs.map(_._2).sum) }
    val want = cells.map { case (k, (n, x)) =>
      val pBp = (x + 2) * 10000 / (n + 4)
      val vv = pBp * (10000 - pBp) / (n + 4)
      val lcb = math.max(0L, pBp - 2 * isqrt(vv))
      k -> (n, x, pBp, lcb)
    }
    val got = graft.SparkEntry.queries("q280_return_rate_lcb")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == want)
    // the inversion: cell A has a HIGHER raw rate than B but a LOWER
    // LCB (A is small, B is well-attested) — raw-rate ranking would
    // put A first, which is the bug this op exists to fix
    val v = want.toSeq.map { case (_, (n, x, _, lcb)) => (x * 10000 / n, lcb) }
    val inversion = v.exists { case (rawA, lcbA) =>
      v.exists { case (rawB, lcbB) => rawA > rawB && lcbA < lcbB }
    }
    assert(inversion, "no raw-vs-LCB inversion — fixture cannot " +
      "distinguish LCB ranking from raw-rate ranking")
    // the sigma penalty genuinely bites: some cell's LCB sits well
    // below its point estimate
    assert(want.values.exists { case (_, _, p, lcb) => p - lcb > 500 },
      "no small cell pays a visible penalty — shrinkage untested")
  }

  test("q293 equals the driver-side pair walk and flags EXACTLY the " +
    "injected double postings — nothing else (zero natural collisions)") {
    val grain = T(spark, dir, "lineitem")
      .selectExpr("l_suppkey", "l_orderkey", "l_linenumber",
        "cast(round(l_extendedprice * 100) as bigint)",
        "cast(l_shipdate as date)")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getInt(2)),
        (r.getLong(3), r.getDate(4).toLocalDate)))
      .groupBy(_._1)
      .map { case ((sk, doc, ln), rs) =>
        (sk, doc, ln.toLong, rs.map(_._2._1).sum,
          rs.map(_._2._2).minBy(_.toEpochDay)) }
      .toSeq
    val reposts = grain.filter { case (_, doc, ln, _, _) =>
      graft.SparkTestBase.md5Long(s"dup:$doc:$ln", 12) % Audit.DupMod == 0 }
      .map { case (sk, doc, ln, c2, d) =>
        (sk, doc + Audit.DupDocOffset, ln, c2,
          d.plusDays(Audit.DupWindowDays - 4L)) }
    val pays = grain ++ reposts
    val pairs = pays.groupBy(p => (p._1, p._4)).values.toSeq.flatMap { blk =>
      for {
        a <- blk; b <- blk
        if (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)) &&
          math.abs(java.time.temporal.ChronoUnit.DAYS
            .between(a._5, b._5)) <= Audit.DupWindowDays
      } yield (a._1, a._4)
    }
    val want = pays.groupBy(_._1).map { case (sk, ps) =>
      val fp = pairs.filter(_._1 == sk)
      sk -> (ps.size.toLong, fp.size.toLong, fp.map(_._2).sum) }
    val got = graft.SparkEntry.queries("q293_dup_payments")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    // precision AND recall are exact on this fixture: one pair per
    // injected repost, no accidental amount collision adds noise
    assert(pairs.size == reposts.size,
      "pair count != injected reposts — false positives or misses")
    assert(got.values.map(_._3).sum == reposts.map(_._4).sum,
      "cents at risk != injected cents")
    assert(reposts.nonEmpty, "no injected duplicate — detector untested")
  }
}
