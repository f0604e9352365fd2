package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.rfc.{MockRfcBackend, RfcField, RfcQueries}
import graft.sources.rfc.MockRfcBackend.MockTable

/** The sap-rfc COUNT(*) pushdown: complete pushdown in PERMISSIVE mode
  * (one scan row, no aggregate node, ZERO data-page calls — the count
  * comes from the server), and hard mode gates everywhere the server's
  * raw count could diverge from the query's semantics. */
class RfcAggPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def znation() = {
    RfcQueries.ensureZnation(spark, SparkTestBase.Sf0001)
    spark.read.format("sap-rfc").option("table", "ZNATION")
  }

  test("PERMISSIVE count(*): pushed — no aggregate node, no page fetch") {
    val df = znation().option("mode", "PERMISSIVE").load()
      .agg(count(lit(1)).as("n_rows"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates=[COUNT(*)]"), plan)
    assert(!plan.contains("HashAggregate"), plan)

    MockRfcBackend.clear()
    RfcQueries.ensureZnation(spark, SparkTestBase.Sf0001)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(25L))
    // schema inference is a rowCount=0 metadata call; the count itself
    // must trigger no data-page fetch
    assert(MockRfcBackend.calls.forall(_.rowCount == 0),
      MockRfcBackend.calls.mkString("\n"))
  }

  test("DROPMALFORMED count(*): NOT pushed (reader may drop rows)") {
    val df = znation().option("mode", "DROPMALFORMED").load()
      .agg(count(lit(1)).as("n_rows"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregates"), plan)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(25L))
  }

  test("filtered count: stays Spark-side in PERMISSIVE, still correct") {
    val df = znation().option("mode", "PERMISSIVE").load()
      .filter(col("REGIONKEY") >= 2)
      .agg(count(lit(1)).as("n_rows"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregates"), plan)
    val expect = graft.ops.T(spark, SparkTestBase.Sf0001, "nation")
      .filter(col("n_regionkey") >= 2).count()
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(expect))
  }

  test("PERMISSIVE count includes malformed WA rows, matching the scan") {
    MockRfcBackend.register("ZC", MockTable(
      Seq(RfcField("A", "C"), RfcField("B", "C")),
      Seq(Seq("x", "y"), Seq("p", "q")),
      rawWa = Seq("only-one-cell")))
    val reader = spark.read.format("sap-rfc").option("table", "ZC")
      .option("mode", "PERMISSIVE")
    val pushed = reader.load().agg(count(lit(1)).as("n")).collect()(0).getLong(0)
    val scanned = reader.load().count()
    assert(pushed == 3L && scanned == 3L)
  }

  test("group-by count: not pushed, correct") {
    val df = znation().option("mode", "PERMISSIVE").load()
      .groupBy("REGIONKEY").agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregates"), plan)
    assert(df.collect().map(_.getLong(1)).sum == 25L)
  }
}
