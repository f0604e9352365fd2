package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q185 persisted inverted index: the probe's efficiency half (the
  * DuckDB oracle checks the values) — the plan reads ONLY the index
  * table, bucket-prunes to the probed terms' buckets, and keeps the
  * WindowGroupLimit partial top-k below the exchange. */
class IndexedPostingsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("probe reads only the index table with pruned buckets and an " +
    "exchange-free per-term window") {
    // AQE hides the static scan behind unexecuted query stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { probeAssertions() }
    finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  private def probeAssertions(): Unit = {
    val df = TrainingData.q185IndexedPostings(spark, SparkTestBase.Sf0001)
    assert(df.collect().nonEmpty)

    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1, "probe must touch exactly one table")
    assert(scans.head.toString.contains("graft_postings"),
      scans.head.toString)
    val pruned = scans.head.metadata.get("SelectedBucketsCount")
    assert(pruned.isDefined, scans.head.metadata.toString)
    val m = "(\\d+) out of (\\d+)".r.findFirstMatchIn(pruned.get).get
    assert(m.group(1).toInt < m.group(2).toInt,
      s"bucket pruning did not bind: ${pruned.get}")

    // the probe itself is EXCHANGE-FREE: bucketing co-locates each
    // term, so the per-term window needs no shuffle — the single
    // Exchange in the plan is the presentation orderBy
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, plan)
    assert(plan.contains("Window"), plan)
  }

  test("adopting the on-disk index in a fresh session answers " +
    "identically without rebuilding") {
    val first = TrainingData.q185IndexedPostings(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    val s2 = spark.newSession()
    val again = TrainingData.q185IndexedPostings(s2, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(again == first)
  }
}
