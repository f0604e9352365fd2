package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q175 column stats: every reported number recomputed driver-side from
  * the raw rows, and the plan pinned to ONE scan (the multi-distinct
  * Expand rewrite — not one pass per column, not a join of passes). */
class ColumnStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("profile matches a driver-side recompute of every column") {
    val rows = T(spark, SparkTestBase.Sf0001, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber", "l_quantity",
        "l_returnflag", "l_linestatus", "cast(l_shipdate as string)")
      .collect()
    val got = Relational.q175ColumnStats(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
      .toMap

    // `vals` must arrive sorted in the column's NATIVE order (numeric
    // for numbers — "9" > "10" lexicographically would corrupt min/max)
    def check(name: String, vals: Seq[Any], asStr: Any => String): Unit = {
      val nonNull = vals.filter(_ != null)
      val (n, nulls, ndv, mn, mx) = got(name)
      assert(n == vals.size.toLong, s"$name n_rows")
      assert(nulls == (vals.size - nonNull.size).toLong, s"$name n_nulls")
      assert(ndv == nonNull.distinct.size.toLong, s"$name ndv")
      assert(mn == asStr(nonNull.head), s"$name min")
      assert(mx == asStr(nonNull.last), s"$name max")
    }

    // numeric columns sort numerically, then stringify like Spark's cast
    check("l_orderkey", rows.map(_.getLong(0)).sorted.toSeq,
      v => v.toString)
    check("l_linenumber", rows.map(_.getInt(1)).sorted.toSeq,
      v => v.toString)
    check("l_quantity", rows.map(_.getDouble(2)).sorted.toSeq,
      v => v.toString)
    check("l_returnflag", rows.map(_.getString(3)).sorted.toSeq,
      v => v.toString)
    check("l_linestatus", rows.map(_.getString(4)).sorted.toSeq,
      v => v.toString)
    check("l_shipdate", rows.map(_.getString(5)).sorted.toSeq,
      v => v.toString)
  }

  test("one narrow scan per column, no Expand — each scan decodes " +
    "exactly its profiled column") {
    val df = Relational.q175ColumnStats(spark, SparkTestBase.Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the union formulation: |cols| independent single-column passes
    // (same total bytes as one wide scan — parquet is columnar), no
    // Expand row multiplication, no join
    assert(!plan.contains("Expand"), plan)
    assert(!plan.contains("Join"), plan)
    val readSchemas = plan.linesIterator
      .filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.size == 6, plan)
    // every scan's schema is exactly one column wide
    readSchemas.foreach { rs =>
      val inner = rs.substring(rs.indexOf("struct<"))
      assert(!inner.contains(","), rs)
    }
  }
}
