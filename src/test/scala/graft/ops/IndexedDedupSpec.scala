package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q107 — the persisted-LSH-index ingest path. Two contracts:
  *
  *  1. output identity: probing the bucketed band index returns exactly
  *     q104's rows (same oracle drives both in CORRECTNESS);
  *  2. plan shape: the index side of the probe join reads WITHOUT a
  *     shuffle exchange — the bucketed layout already satisfies the
  *     join's required hash distribution, so per-ingest cost never
  *     includes re-shuffling the corpus. (A Sort may remain on the index
  *     side unless the legacy bucketed-scan ordering conf is set — the
  *     exchange, not the sort, is the 100 TB cost being pinned.)
  */
class IndexedDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("q107 equals q104 row-for-row") {
    val expected = Curation.q104IncrementalDedup(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    val got = Curation.q107IndexedDedup(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("probe join reads the band index with no exchange on the corpus side") {
    // force the SMJ path: broadcast would trivially skip the exchange,
    // and AQE re-planning would hide the static shape under query stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Curation.q107IndexedDedup(spark, SparkTestBase.Sf0001)
      val plan = df.queryExecution.executedPlan
      def hasBucketedScan(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collectFirst {
          case f: FileSourceScanExec if f.relation.bucketSpec.nonEmpty => f
        }.nonEmpty
      val probe = plan.collect { case j: SortMergeJoinExec => j }
        .find(j => Seq(j.left, j.right).exists(hasBucketedScan))
      assert(probe.nonEmpty, s"no SMJ against the bucketed index:\n$plan")
      val idxSide = Seq(probe.get.left, probe.get.right)
        .find(hasBucketedScan).get
      val exchanges = idxSide.collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.isEmpty,
        s"index side of the probe join still shuffles:\n$idxSide")
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
