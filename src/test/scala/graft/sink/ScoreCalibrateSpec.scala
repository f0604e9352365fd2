package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** q240 (histogram-calibrated percentiles) beyond the DuckDB oracle: a
  * driver-side binary-search recomputation of every bucket assignment
  * against the STORED histogram, the bracket invariant (each score sits
  * at or below its bucket's boundary and above the previous one), bp
  * bounds/monotonicity, and the scan-shaped plan (no join, no
  * aggregate — calibration must stay O(1) per row). */
class ScoreCalibrateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val his: Array[Long] =
    StatsDecision.readHistogram(spark,
      StatsDecision.ensureHistogram(spark, dir)).map(_._4)

  private lazy val rows =
    StatsDecision.q240ScoreCalibrate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))

  private val B = StatsDecision.Buckets

  test("every bucket assignment equals the driver-side count-below " +
    "search on the stored boundaries; calib_bp is its exact projection") {
    assert(rows.nonEmpty)
    rows.foreach { case (k, c2, b, bp) =>
      val expect = math.min(his.count(_ < c2) + 1, B)
      assert(b == expect, s"order $k")
      assert(bp == (b - 1).toLong * 10000L / B, s"order $k")
    }
  }

  test("bracket invariant: a score never exceeds its bucket's upper " +
    "boundary (except in the capped last bucket) and always exceeds " +
    "the previous bucket's") {
    rows.foreach { case (k, c2, b, _) =>
      if (b < B) assert(c2 <= his(b - 1), s"order $k above bucket $b")
      if (b > 1) assert(c2 > his(b - 2), s"order $k below bucket $b")
    }
  }

  test("calibration is monotone in the score and lands in [0, 10000)") {
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, _, b1, _), (_, _, b2, _)) => assert(b1 <= b2)
      case _ =>
    }
    rows.foreach { case (_, _, _, bp) => assert(bp >= 0 && bp < 10000) }
  }

  test("the calibrate plan is scan-shaped: no join, no aggregate — the " +
    "boundaries ride a literal, never an exchange-bearing operator") {
    val plan = StatsDecision.q240ScoreCalibrate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
  }
}
