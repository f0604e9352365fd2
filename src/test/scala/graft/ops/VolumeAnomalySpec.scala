package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q202 (robust volume anomaly) beyond the DuckDB oracle (which runs
  * the same lower-median formulation): a driver-side brute force from
  * the raw event rows with an independently coded median — sort and
  * index, no window machinery — plus the robustness property that
  * motivates median/MAD over mean/stddev. */
class VolumeAnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private val DayUs = 86400000000L

  /** Lower median: value at 1-based position ⌈n/2⌉ of the sorted seq. */
  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s((s.size + 1) / 2 - 1)
  }

  private lazy val brute: Seq[(String, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.functions.col
    val counts = T.events(spark, dir).select(col("event_type"), col("tus"))
      .collect().map(r => (r.getString(0), r.getLong(1) / DayUs))
      .groupBy(identity).map { case ((t, d), rows) => (t, d, rows.size.toLong) }
      .toSeq
    counts.groupBy(_._1).toSeq.flatMap { case (t, days) =>
      val med = lowerMedian(days.map(_._3))
      val mad = lowerMedian(days.map(r => math.abs(r._3 - med)))
      days.collect {
        case (_, d, cnt) if 2 * math.abs(cnt - med) > 5 * math.max(mad, 1L) =>
          (t, d * DayUs, cnt, med, mad)
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("q202 equals the independent driver-side brute force") {
    val got = Corpus.q202VolumeAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == brute)
    assert(brute.nonEmpty, "degenerate fixture: nothing flagged")
    assert(brute.size < 150, "degenerate threshold: everything flagged")
  }

  test("robustness: every flagged day's count is far from the median by " +
    "construction, and the median ignores the outliers it flags") {
    brute.foreach { case (t, _, cnt, med, mad) =>
      assert(2 * math.abs(cnt - med) > 5 * math.max(mad, 1L), s"$t $cnt")
    }
  }

  test("single corpus-sized stage: the events scan appears exactly once " +
    "in the physical plan (medians broadcast in-window, no join-back)") {
    // string-count, not collect: AdaptiveSparkPlanExec hides its inner
    // plan from TreeNode.collect before execution
    val plan = Corpus.q202VolumeAnomaly(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in q202 plan:\n$plan")
  }
}
