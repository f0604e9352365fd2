package graft.sink

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q110 through the query path: the bucketed orders copy must answer
  * the bucket-key lookup identically to the raw table, and the scan
  * must PLAN the skip — `SelectedBucketsCount ≤ 2 out of 16` for a
  * two-key IN predicate (each key hashes to exactly one bucket), no
  * footer reads for the rest. */
class BucketPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("q110 result matches the same aggregate over the raw table") {
    val raw = graft.ops.T(spark, SparkTestBase.Sf0001, "orders")
      .filter(col("o_custkey").isin(37L, 73L))
      .groupBy("o_custkey", "o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice")), 4).as("sum_price"))
      .orderBy("o_custkey", "o_orderstatus")
      .collect().map(_.toSeq).toSeq
    val got = BucketQueries.q110BucketPrune(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == raw)
    assert(got.nonEmpty, "lookup keys missing from sf0.001 — vacuous test")
  }

  test("the bucket-key predicate prunes buckets at planning time") {
    // AQE hides the static scan behind unexecuted query stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = BucketQueries.q110BucketPrune(spark, SparkTestBase.Sf0001)
      val scan = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.relation.bucketSpec.nonEmpty => f
      }
      assert(scan.nonEmpty, "no bucketed scan in the q110 plan")
      val selected = scan.head.metadata.get("SelectedBucketsCount")
      assert(selected.nonEmpty, "bucket pruning did not plan")
      // "k out of 16": two point keys touch at most two buckets
      val k = selected.get.trim.split(" ").head.toInt
      assert(k >= 1 && k <= 2,
        s"expected <=2 of 16 buckets, planned: ${selected.get}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
