package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q36/q39's INDEPENDENT verification channel. Since r16 both are
  * driver-graded via self-validation (exact values + bound verdicts the
  * DuckDB oracle asserts TRUE — SURVEY.md §2.3); this spec keeps the
  * legs the hash gate cannot see: the RAW estimates (recomputed here
  * directly, outside the graded projection) against their exact
  * counterparts, and that the graded verdict columns agree with a
  * driver-side recompute of the same bound.
  */
class HllBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("q39: raw approx_percentile within 5% of exact percentiles, and " +
    "every graded bound verdict is TRUE with lo <= hi") {
    val raw = T(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5d, ${Relational.GkAccuracy})")
          .as("ap50"),
        expr(s"approx_percentile(l_extendedprice, 0.9d, " +
          s"${Relational.GkAccuracy})").as("ap90"),
        expr("percentile(l_quantity, 0.5d)").as("e50"),
        expr("percentile(l_extendedprice, 0.9d)").as("e90"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val (a50, e50) = (r.getAs[Double]("ap50"), r.getAs[Double]("e50"))
      val (a90, e90) = (r.getAs[Double]("ap90"), r.getAs[Double]("e90"))
      assert(math.abs(a50 - e50) <= 0.05 * e50, s"$flag p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= 0.05 * e90, s"$flag p90: $a90 vs $e90")
    }
    val graded = Relational.q39ApproxPercentile(spark, dir).collect()
    assert(graded.length == raw.length)
    graded.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Boolean]("qty_ok"), s"$flag qty verdict false")
      assert(r.getAs[Boolean]("price_ok"), s"$flag price verdict false")
      assert(r.getAs[Long]("qty_lo_c2") <= r.getAs[Long]("qty_hi_c2"))
      assert(r.getAs[Long]("price_lo_c2") <= r.getAs[Long]("price_hi_c2"))
    }
    // the bound window is NARROW (a rank slack of ~n/1000), not a
    // vacuous always-true envelope: lo must sit within 25% of hi
    graded.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("price_lo_c2"), r.getAs[Long]("price_hi_c2"))
      assert(hi - lo <= hi / 4, s"vacuous bound window [$lo, $hi]")
    }
  }

  test("q36: raw approx_count_distinct within 5% of exact; graded " +
    "verdict equals an independent driver-side recompute of the bound") {
    val raw = T(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        countDistinct(col("l_partkey")).as("ex"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("ap"), r.getAs[Long]("ex"))).toMap
    assert(raw.nonEmpty)
    raw.foreach { case (flag, (ap, ex)) =>
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"$flag: approx $ap vs exact $ex")
    }
    val graded = Relational.q36AggApproxDistinct(spark, dir).collect()
    assert(graded.length == raw.size)
    graded.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val (ap, ex) = raw(flag)
      assert(r.getAs[Long]("exact_parts") == ex, s"$flag exact drifted")
      assert(r.getAs[Boolean]("approx_ok") ==
        (math.abs(ap - ex) * 20 <= ex), s"$flag verdict != recompute")
      assert(r.getAs[Boolean]("approx_ok"), s"$flag estimate out of bound")
    }
  }

  test("q36's verdict expression fires FALSE on a genuinely out-of-bound " +
    "estimate (the PRODUCTION Column, not re-derived arithmetic)") {
    // evaluate Relational.approxOk — the exact Column q36's graded
    // projection emits — on values straddling the envelope:
    // |205−200|·20 = 100 ≤ 200 (2.5%, in), |210−200|·20 = 200 ≤ 200
    // (exactly 5%, closed bound holds), |211−200|·20 = 220 > 200 (out)
    import spark.implicits._
    val verdicts = Seq((205L, 200L), (210L, 200L), (211L, 200L))
      .toDF("ap", "exact")
      .select(col("ap"), Relational.approxOk(col("ap"), col("exact"))
        .as("approx_ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts(205L), "5% bound must accept a 2.5% error")
    assert(verdicts(210L), "exactly 5% sits inside the closed bound")
    assert(!verdicts(211L), "5.5% error must read out-of-bound")
  }
}
