package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q36/q39 have no DuckDB oracle (sketch internals are engine-
  * specific); this is their verification channel (SURVEY.md §2.3): each
  * estimate must sit within a tolerance of its exact counterpart. */
class HllBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("q39 approx_percentile within 5% of exact percentiles, per group") {
    val approx = Relational.q39ApproxPercentile(spark, SparkTestBase.Sf0001)
    val exact = T(spark, SparkTestBase.Sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5d)").as("e50"),
        expr("percentile(l_extendedprice, 0.9d)").as("e90"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val (a50, e50) = (r.getAs[Double]("ap50"), r.getAs[Double]("e50"))
      val (a90, e90) = (r.getAs[Double]("ap90"), r.getAs[Double]("e90"))
      assert(math.abs(a50 - e50) <= 0.05 * e50, s"$flag p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= 0.05 * e90, s"$flag p90: $a90 vs $e90")
    }
  }

  test("q36 approx_count_distinct within 5% of exact, per l_returnflag") {
    val approx = Relational.q36AggApproxDistinct(spark, SparkTestBase.Sf0001)
    val exact = T(spark, SparkTestBase.Sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val est = r.getAs[Long]("approx_parts").toDouble
      val ex = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - ex) / ex <= 0.05,
        s"${r.getAs[String]("l_returnflag")}: approx $est vs exact $ex")
    }
  }
}
