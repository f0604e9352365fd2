package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q36 has no DuckDB oracle (HLL estimates are engine-specific); this is
  * its verification channel (SURVEY.md §2.3): the approx_count_distinct
  * estimate must sit within 5% of the exact distinct count per group. */
class HllBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

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
