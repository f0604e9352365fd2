package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the two properties the sketch-rollup pattern rests on: the
  * union-of-parts estimate is close to exact, and — the part that makes
  * incremental pre-aggregation SOUND, not just approximately ok — the
  * union of per-day sketches equals the sketch of the whole table
  * exactly (HLL union at a fixed lgK is lossless). */
class SketchRollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("per-day sketch rollup estimates global distinct users within 5%, " +
    "and equals the direct global sketch EXACTLY (lossless union)") {
    val events = T(spark, SparkTestBase.Sf0001, "events")
    val daily = SketchRollup.dailyUserSketches(events)
    assert(daily.count() > 1, "need multiple days for the rollup to mean anything")

    val exact = events.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val rolled = SketchRollup.totalDistinctUsers(daily)
    assert(math.abs(rolled - exact).toDouble / exact <= 0.05,
      s"rollup estimate $rolled vs exact $exact")

    // associativity/losslessness: sketching everything in one pass gives
    // the identical estimate to unioning the per-day sketches
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)
    assert(rolled == direct, s"union-of-daily $rolled != direct $direct")
  }
}
