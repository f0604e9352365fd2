package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q278 (Benford first-digit audit) beyond the DuckDB oracle: the
  * constant table really is Benford's law, the digit extraction
  * matches a driver-side decimal walk, and the audit genuinely flags
  * the synthetic generator's uniform prices. */
class BenfordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("the constant table IS Benford: floor(log10(1+1/d)*1e4), and it " +
    "accounts for the whole distribution") {
    val law = (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e4).toLong)
    assert(Audit.BenfordBp == law)
    assert(Audit.BenfordBp.sum == 9995L) // 5 bp lost to per-digit floors
  }

  test("q278 equals the driver-side first-digit walk; the uniform " +
    "generator is genuinely flagged") {
    val cents = T(spark, dir, "orders")
      .select(expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(_.getLong(0)).filter(_ > 0)
    val counts = cents.groupBy(c => c.toString.charAt(0).asDigit)
      .map { case (d, v) => d -> v.size.toLong }
    val tot = cents.length.toLong
    val got = graft.SparkEntry.queries("q278_benford_audit")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap
    assert(got.keySet == counts.keySet)
    got.foreach { case (d, (n, share, law, dev)) =>
      assert(n == counts(d), s"digit $d count")
      assert(share == n * 10000 / tot, s"digit $d share")
      assert(law == Audit.BenfordBp(d - 1), s"digit $d expectation")
      assert(dev == math.abs(share - law), s"digit $d deviation")
    }
    // synthetic uniform prices are NOT Benford — the audit must say so
    // loudly (some digit deviates by > 500 bp)
    assert(got.values.exists(_._4 > 500),
      "uniform generator passed the Benford screen — audit is toothless")
  }
}
