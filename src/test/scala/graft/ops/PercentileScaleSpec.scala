package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q37's scale rework: the two-pass rank + row-pick must return the
  * bit-identical result of the replaced whole-group-buffering
  * `percentile(...)` aggregate (kept alive here as the reference), and
  * its plan must never buffer a group — no Percentile agg function, no
  * ObjectHashAggregate (the buffer-backed operator the old plan used).
  */
class PercentileScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("q37 equals the replaced percentile() aggregate bit-for-bit") {
    val expected = T(spark, SparkTestBase.Sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5d)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.9d)"), 4).as("p90"),
        round(expr("percentile(l_extendedprice, 0.25d)"), 4)
          .as("price_p25"))
      .orderBy("l_returnflag")
      .collect().map(_.toSeq).toSeq
    val got = Relational.q37Percentile(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
    assert(got.size >= 3, "degenerate fixture: fewer than 3 groups")
  }

  test("the plan holds no whole-group buffer") {
    val plan = Relational.q37Percentile(spark, SparkTestBase.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "the buffering agg is back")
    assert(!plan.contains("ObjectHashAggregate"),
      "a buffer-backed aggregate reappeared in q37's plan")
  }
}
