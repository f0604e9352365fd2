package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** q241 (fixed-width round trip) beyond the DuckDB oracle: the layout
  * parser's unit semantics on adversarial synthetic lines (padding,
  * trimming, truncation, casts), the physical line-width invariant of
  * the written extract, row-count identity, and that the truncation
  * edge genuinely fires on the fixture. */
class FixedWidthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("parse unit semantics: zero-pad numerics, space-trim strings, " +
    "positional slicing — on hand-built lines") {
    import spark.implicits._
    val layout = Seq(
      FixedWidth.FwField("a", 1, 5, "bigint"),
      FixedWidth.FwField("b", 6, 4, "string"),
      FixedWidth.FwField("c", 10, 3, "bigint"))
    val got = FixedWidth.parse(
      Seq("00042xy  007", "00000  z 000").toDF("value"), layout)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((42L, "xy", 7L), (0L, "z", 0L)))
  }

  test("the written extract is physically fixed-width: every line is " +
    "exactly 53 chars") {
    val path = FixedWidth.ensureFixedWidthOrders(spark, dir)
    val widths = spark.read.text(path)
      .select(length(col("value")).as("w")).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(widths == Seq(53), s"line widths $widths")
  }

  test("row-count identity: the text extract has exactly one line per " +
    "order, and the parsed keys are the order keys") {
    val path = FixedWidth.ensureFixedWidthOrders(spark, dir)
    val parsed = FixedWidth.parse(spark.read.text(path),
      FixedWidth.OrdersLayout)
    val raw = T(spark, dir, "orders")
    assert(parsed.count() == raw.count())
    assert(parsed.agg(sum("okey")).collect().head.getLong(0) ==
      raw.agg(sum("o_orderkey")).collect().head.getLong(0))
  }

  test("the truncation edge fires: some priority is longer than its " +
    "6-char field, so the parsed distinct set is genuinely the " +
    "truncated one") {
    val longPrio = T(spark, dir, "orders")
      .filter(length(col("o_orderpriority")) > 6).count()
    assert(longPrio > 0, "fixture has no over-width priority — the " +
      "truncation semantics would be untested")
    val path = FixedWidth.ensureFixedWidthOrders(spark, dir)
    val parsed = FixedWidth.parse(spark.read.text(path),
      FixedWidth.OrdersLayout)
    val maxLen = parsed.agg(max(length(col("prio_t"))))
      .collect().head.getInt(0)
    assert(maxLen <= 6)
  }
}
