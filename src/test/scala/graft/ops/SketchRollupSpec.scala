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

  test("count-min rollup: merged daily sketches bound every user's true " +
    "frequency one-sidedly and equal the direct global sketch bit-for-bit") {
    import org.apache.spark.sql.Row
    val events = T(spark, SparkTestBase.Sf0001, "events")
    // cache: count / merge / bit-compare below would otherwise re-run
    // the sketch aggregation three times
    val daily = SketchRollup.dailyUserFreqSketches(events).cache()
    assert(daily.count() > 1)

    val exact = events.groupBy("user_id").count()
      .collect().map { case Row(u: Long, c: Long) => u -> c }.toMap
    val n = exact.values.sum
    val est = SketchRollup.mergedUserFreq(daily, exact.keys.toSeq)
    // count-min error is one-sided: never under, over by ≤ ε·N w.p. 1-δ
    est.foreach { case (u, e) =>
      assert(e >= exact(u), s"user $u: est $e under-counts ${exact(u)}")
      assert(e <= exact(u) + (0.001 * n).ceil.toLong + 1,
        s"user $u: est $e exceeds ε·N bound over ${exact(u)}")
    }

    // merge is plain counter addition at a fixed seed: the merged daily
    // blobs must equal the one-pass global sketch EXACTLY
    val direct = events
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"))
      .collect()(0).getAs[Array[Byte]](0)
    import org.apache.spark.util.sketch.CountMinSketch
    val merged = daily.select("cms").collect()
      .map(r => CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    assert(java.util.Arrays.equals(out.toByteArray, direct),
      "merged daily count-min sketches differ from the direct global sketch")
  }

  test("histogram quantile rollup: merged-of-daily equals the direct " +
    "global histogram exactly, and every quantile estimate sits within " +
    "one bucket width above the true quantile") {
    val events = T(spark, SparkTestBase.Sf0001, "events")
    val (lo, hi, buckets) = (0.0, 1000.0, 256)
    val daily = SketchRollup.dailyValueHistograms(events, lo, hi, buckets)
      .persist()
    assert(daily.select("day").distinct().count() > 1)

    // exact mergeability: summing the daily histograms equals a direct
    // one-pass global histogram, count for count
    val mergedCounts = daily.groupBy("bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = SketchRollup.dailyValueHistograms(
        events.withColumn("ts", org.apache.spark.sql.functions.lit(0L)),
        lo, hi, buckets)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(mergedCounts == direct,
      "summed daily histograms differ from the one-pass global histogram")

    // quantile error bound: estimate ∈ [true, true + bucket width]
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = SketchRollup.histogramQuantiles(daily, lo, hi, buckets, qs)
    val exactQ = events.stat.approxQuantile("value", qs.toArray, 0.0)
    val width = (hi - lo) / buckets
    qs.indices.foreach { i =>
      assert(est(i) >= exactQ(i) - 1e-9,
        s"q=${qs(i)}: est ${est(i)} below exact ${exactQ(i)}")
      assert(est(i) <= exactQ(i) + width + 1e-9,
        s"q=${qs(i)}: est ${est(i)} over a bucket width above ${exactQ(i)}")
    }
    daily.unpersist()
  }
}
