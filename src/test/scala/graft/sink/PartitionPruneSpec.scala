package graft.sink

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q133 through the query path: the hive-partitioned orders copy must
  * (a) answer the month-range aggregate identically to the raw table and
  * (b) deliver PLANNING-time directory elimination — `selectedPartitions`
  * is exactly the in-range month count, a strict subset of the
  * directories written, and the month predicate binds as a partition
  * filter (not a data filter pushed into parquet). */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("q133 result matches the same aggregate over the raw table") {
    val raw = graft.ops.T(spark, SparkTestBase.Sf0001, "orders")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .filter(col("o_month") >= "1997-03" && col("o_month") <= "1997-05")
      .groupBy("o_month", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_month", "o_orderpriority")
      .collect().map(_.toSeq).toSeq
    val got = PartitionedQueries.q133PartitionPrune(spark,
      SparkTestBase.Sf0001).collect().map(_.toSeq).toSeq
    assert(got == raw)
    assert(got.nonEmpty, "month range selected no rows — test is vacuous")
  }

  test("the month range eliminates out-of-range directories at planning " +
    "time (selectedPartitions == 3 of the months written)") {
    val dir = PartitionedQueries.ensurePartitionedOrders(spark,
      SparkTestBase.Sf0001)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val monthDirs = fs.listStatus(p)
      .count(_.getPath.getName.startsWith("o_month="))
    assert(monthDirs > 12,
      s"fixture spans $monthDirs months — too few for the prune to matter")

    // AQE hides the static plan behind unexecuted query stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      PartitionedQueries.q133PartitionPrune(spark, SparkTestBase.Sf0001)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.nonEmpty, "no FileSourceScanExec in the q133 plan")
    val selected = scans.map(_.selectedPartitions.partitionCount).sum
    assert(selected == 3,
      s"expected exactly the 3 in-range month directories, got $selected " +
        s"of $monthDirs")
    // the month predicate must be a PARTITION filter; the parquet data
    // filter side has nothing left to push
    val s = scans.head
    assert(s.partitionFilters.exists(_.toString.contains("o_month")),
      s"month predicate missing from partitionFilters: ${s.partitionFilters}")
    assert(!s.dataFilters.exists(_.toString.contains("o_month")),
      s"month predicate leaked into dataFilters: ${s.dataFilters}")
  }
}
