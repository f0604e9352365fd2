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
}
