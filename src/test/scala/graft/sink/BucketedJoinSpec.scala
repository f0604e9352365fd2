package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** Pins the whole point of bucketing: a join between two tables
  * bucketed identically on the join key plans WITHOUT a shuffle
  * exchange on either side (and, with sortBy, without a sort), while
  * returning exactly the rows of the plain join. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("identically-bucketed tables join with no exchange and no sort") {
    val orders = T(spark, SparkTestBase.Sf0001, "orders")
    val lineitem = T(spark, SparkTestBase.Sf0001, "lineitem")
    BucketedTables.save(orders, "b_orders", 4, "o_orderkey")
    BucketedTables.save(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", 4, "o_orderkey")
    try {
      // disable auto-broadcast so the test exercises the SMJ path the
      // bucketing exists for (a broadcast join needs no exchange anyway)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // since Spark 3.0 bucketed scans don't report their sort order
      // unless this is set (SPARK-28169: a bucket split across files
      // would need a merge); BucketedTables.save guarantees one file
      // per bucket, which is exactly the layout the conf is safe for
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // "- Sort " matches both renderings (":- Sort" first child,
      // "+- Sort" second child) — a one-sided regression must fail too
      assert(!plan.contains("- Sort "), s"bucketed join still sorts:\n$plan")
      // correctness: identical row count to the plain (shuffling) join
      val expected = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .count()
      assert(joined.count() == expected)
      // bucket pruning: an equality predicate on the bucket key scans a
      // subset of buckets (SelectedBucketsCount in the scan node). The
      // planner auto-disables bucketed reading for plans with no
      // distribution requirement (DisableUnnecessaryBucketedScan), which
      // also forfeits pruning — pin it on for the point lookup.
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val pruned = spark.table("b_orders").filter(col("o_orderkey") === 42L)
      val scanPlan = pruned.queryExecution.executedPlan.toString
      assert(scanPlan.contains("SelectedBucketsCount: 1 out of 4"), scanPlan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
