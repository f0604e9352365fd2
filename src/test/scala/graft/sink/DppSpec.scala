package graft.sink

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q201 beyond the DuckDB oracle (which proves only the RESULT): the
  * dimension's month set must bind to the fact scan as a DYNAMIC
  * partition filter, and at run time the scan must read exactly the
  * dimension's months — directory elimination with a key set no
  * planning-time literal could provide. */
class DppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def dimMonths(): Set[String] =
    graft.ops.T(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= expr("timestamp'1997-01-01'") &&
        col("l_shipdate") < expr("timestamp'1997-04-01'"))
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("m"))
      .distinct().collect().map(_.getString(0)).toSet

  test("q201 result matches the same join over the raw table") {
    val months = dimMonths()
    assert(months.nonEmpty, "no returned Q1-1997 shipments — vacuous")
    val raw = graft.ops.T(spark, dir, "orders")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .filter(col("o_month").isin(months.toSeq: _*))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_month")
      .collect().map(_.toSeq).toSeq
    val got = PartitionedQueries.q201DppJoin(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got == raw)
    assert(got.nonEmpty)
  }

  test("the dimension months bind as a dynamicpruning partition filter " +
    "on the fact scan") {
    val scans = SparkTestBase.withConf("spark.sql.adaptive.enabled" -> "false") {
      PartitionedQueries.q201DppJoin(spark, dir)
        .queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    }
    val factScans = scans.filter(_.output.exists(_.name == "o_month"))
    assert(factScans.nonEmpty, s"no fact scan found: $scans")
    assert(factScans.exists(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning"))),
      s"no dynamic pruning filter on the fact scan: " +
        s"${factScans.map(_.partitionFilters)}")
  }

  test("at run time the fact scan reads EXACTLY the dimension's month " +
    "directories, not all of them") {
    val partRoot = PartitionedQueries.ensurePartitionedOrders(spark, dir)
    val totalMonths = {
      val p = new org.apache.hadoop.fs.Path(partRoot)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(_.getPath.getName.startsWith("o_month="))
    }
    val expected = dimMonths().size
    assert(expected < totalMonths,
      s"fixture degenerate: dim selects $expected of $totalMonths months")

    SparkTestBase.withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = PartitionedQueries.q201DppJoin(spark, dir)
      df.collect()
      val factScans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.output.exists(_.name == "o_month") => f
      }
      val read = factScans.map(_.metrics("numPartitions").value).sum
      assert(read == expected,
        s"fact scan read $read partitions; dim selects $expected of " +
          s"$totalMonths")
    }
  }
}
