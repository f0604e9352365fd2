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

  test("all value columns ride ONE composite rank pass (r11: previously " +
    "one full two-pass rank per column plus a join)") {
    val before = ScalableRank.passes.get()
    // building the frame runs the eager rank passes; no action needed
    Relational.q37Percentile(spark, SparkTestBase.Sf0001)
    val used = ScalableRank.passes.get() - before
    assert(used == 1, s"q37 consumed $used ScalableRank passes, want 1")
  }

  test("a NULL group KEY holding real values gets its computed " +
    "quantile, not a spurious all-NULL row (null-safe joins, r11 " +
    "review)") {
    import spark.implicits._
    val df = Seq((Option("a"), 1.0), (Option("a"), 3.0),
      (Option.empty[String], 5.0), (Option.empty[String], 9.0))
      .toDF("g", "v")
    val got = Relational.testGroupedQuantiles(df, "g",
        Seq(("v", Seq(("p50", 0.5)))))
      .orderBy(asc_nulls_first("g")).collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(0) && got(0).getDouble(1) == 7.0,
      s"NULL-keyed group lost its values: ${got.toSeq}")
    assert(got(1).getString(0) == "a" && got(1).getDouble(1) == 2.0)
  }

  test("an all-NULL group keeps its row with NULL quantiles " +
    "(percentile() group-cardinality semantics, ADVICE r10)") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None))
      .toDF("g", "v")
    val got = Relational.testGroupedQuantiles(df, "g",
        Seq(("v", Seq(("p50", 0.5)))))
      .orderBy("g").collect()
    assert(got.length == 2, "the all-NULL group was dropped")
    assert(got(0).getString(0) == "a" && got(0).getDouble(1) == 2.0)
    assert(got(1).getString(0) == "b" && got(1).isNullAt(1))
  }
}
