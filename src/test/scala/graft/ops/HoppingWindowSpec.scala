package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q169 hopping windows: the µs-integer explode formulation must agree
  * with Spark's OWN `window($"ts", "1 hour", "15 minutes")` expansion —
  * an independent implementation of the same semantics (TimeWindow
  * lowers to an equivalent explode, but computes on the session-UTC
  * timestamp type, not our canonical `tus` integers). The DuckDB oracle
  * mirrors the integer formulation, so without this pin a shared
  * misconception (slide alignment, window membership at exact
  * boundaries) could pass correctness. */
class HoppingWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("q169 equals Spark's native window(1 hour, 15 minutes)") {
    val ours = NorthStar.q169EventHopping(spark, SparkTestBase.Sf0001)

    val native = T(spark, SparkTestBase.Sf0001, "events")
      .select(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"), col("value"))
      .select(
        (unix_timestamp(col("w.start")) * 1000000L).as("ws_us"),
        col("event_type"), col("value"))
      .groupBy("ws_us", "event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_val"))
      .orderBy("ws_us", "event_type")

    val a = ours.collect().toSeq
    val b = native.collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("every event lands in exactly len/slide = 4 windows") {
    val nEvents = T(spark, SparkTestBase.Sf0001, "events").count()
    val total = NorthStar.q169EventHopping(spark, SparkTestBase.Sf0001)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == 4L * nEvents)
  }

  test("each window start is slide-aligned and covers its members") {
    val rows = NorthStar.q169EventHopping(spark, SparkTestBase.Sf0001)
      .select("ws_us").distinct().collect().map(_.getLong(0))
    assert(rows.forall(_ % 900000000L == 0))
  }
}
