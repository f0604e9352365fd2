package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q134–q142 (the TpchShapes suite): independent brute-force
  * formulations over collected sf0.001 rows for the shapes whose Spark
  * query and oracle SQL share structure (EXISTS/NOT-EXISTS as
  * semi/anti, max-equality ties, the semi-join residual), plus the plan
  * pins the scaladocs promise (q141 DNF hull pushdown, q137 top-k). */
class TpchMoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  private def cents(x: Double): Long = math.round(x * 100)
  private def daysAfter(t: Timestamp, days: Int): Timestamp =
    Timestamp.valueOf(t.toLocalDateTime.plusDays(days.toLong))

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q134 matches a brute-force EXISTS over (order, late-line) sets") {
    import spark.implicits._
    val lines = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_shipdate")
      .as[(Long, Timestamp)].collect().groupBy(_._1)
    val lo = Timestamp.valueOf("1996-07-01 00:00:00")
    val hi = Timestamp.valueOf("1996-10-01 00:00:00")
    val expected = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_orderkey", "o_orderdate", "o_orderpriority")
      .as[(Long, Timestamp, String)].collect()
      .filter(o => !o._2.before(lo) && o._2.before(hi))
      .filter(o => lines.getOrElse(o._1, Array.empty)
        .exists(_._2.after(daysAfter(o._2, 90))))
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val got = TpchShapes.q134OrderPriority(spark, Sf)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
    assert(got.values.sum > 0, "no late orders — fixture degenerate")
  }

  test("q140 keeps ALL suppliers tied at the max (exact-integer equality)") {
    import spark.implicits._
    val lo = Timestamp.valueOf("1997-01-01 00:00:00")
    val hi = Timestamp.valueOf("1997-04-01 00:00:00")
    val rev = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .as[(Long, Timestamp, Double, Double)].collect()
      .filter(l => !l._2.before(lo) && l._2.before(hi))
      .groupBy(_._1).view
      .mapValues(_.map(l => cents(l._3) * (100L - cents(l._4))).sum).toMap
    val mx = rev.values.max
    val expected = rev.filter(_._2 == mx).keySet
    val got = TpchShapes.q140TopSupplier(spark, Sf)
      .as[(Long, String, Long)].collect()
    assert(got.map(_._1).toSet == expected)
    assert(got.forall(_._3 == mx))
  }

  test("q142 matches a brute-force exists/not-exists culprit search") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_orderkey", "o_orderstatus", "o_orderdate")
      .as[(Long, String, Timestamp)].collect()
      .filter(_._2 == "F").map(o => o._1 -> o._3).toMap
    val lines = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey", "l_shipdate")
      .as[(Long, Long, Timestamp)].collect()
    val pairs = lines.map(l => (l._1, l._2)).toSet
    val late = lines.filter(l => orders.get(l._1)
        .exists(od => l._3.after(daysAfter(od, 90))))
      .map(l => (l._1, l._2)).toSet
    // NATION_19 (not q142's NATION_7) — the shipped nation's slice is
    // empty at sf0.001, which would make this assertion vacuous
    val nk = spark.read.parquet(s"$Sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect()
      .find(_._2 == "NATION_19").get._1
    val supName = spark.read.parquet(s"$Sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_name", "s_nationkey")
      .as[(Long, String, Int)].collect()
      .filter(_._3 == nk).map(s => s._1 -> s._2).toMap
    val expected = late.toSeq
      .filter { case (ok, sk) => supName.contains(sk) &&
        pairs.exists(p => p._1 == ok && p._2 != sk) &&
        !late.exists(y => y._1 == ok && y._2 != sk) }
      .groupBy(p => supName(p._2)).view.mapValues(_.length.toLong).toMap
    val got = TpchShapes.waitingSuppliers(spark, Sf, "NATION_19")
      .as[(String, Long)].collect().toMap
    assert(got == expected)
    assert(got.nonEmpty, "no waiting suppliers — fixture degenerate")
  }

  test("q141's part-side DNF hull pushes below the join") {
    // The mixed-side OR can't push whole; Catalyst must still extract
    // the part-only (brand ∧ size) hull and filter part BEFORE the join.
    val df = TpchShapes.q141BrandSizeRevenue(spark, Sf)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val join = df.queryExecution.optimizedPlan.collectFirst { case j: Join => j }.get
    val partSide = Seq(join.left, join.right).find(
      _.output.exists(_.name == "p_brand")).get
    val hull = partSide.collectFirst {
      case f: Filter if f.condition.toString.contains("Brand#12") => f }
    assert(hull.nonEmpty,
      s"no brand/size hull filter below the join:\n${df.queryExecution.optimizedPlan}")
  }

  test("q137 top-20 plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(TpchShapes.q137ReturnedTopCustomers(spark, Sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q135 pushes all three predicates into the lineitem scan") {
    val plan = planOf(TpchShapes.q135RevenueForecast(spark, Sf))
    // the rendered PushedFilters list truncates at 100 chars, so match
    // the stable prefix, not a filter that may be cut mid-token
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(plan.contains("GreaterThanOrEqual("), plan)
  }

  test("q276 equals the driver-side 2x2 diff-in-diff walk; all four " +
    "cells populate and the DiD composes the two ratios") {
    val part = T(spark, Sf, "part").select("p_partkey", "p_type")
      .collect().map(r => r.getLong(0) -> (r.getString(1) == "PROMO")).toMap
    val year = T(spark, Sf, "orders")
      .selectExpr("o_orderkey", "year(o_orderdate)")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cells = T(spark, Sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey",
        "cast(round(l_extendedprice * 100) as bigint)")
      .collect()
      .map(r => ((part(r.getLong(1)),
        year(r.getLong(0)) >= TpchShapes.UpliftPivotYear), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, rs) =>
        k -> (rs.length.toLong, rs.map(_._2).sum / rs.length) }
    assert(cells.keySet.size == 4, "a 2x2 cell is empty — weak fixture")
    val (tb, ta) = (cells((true, false)), cells((true, true)))
    val (cb, ca) = (cells((false, false)), cells((false, true)))
    val row = graft.SparkEntry.queries("q276_promo_uplift")(spark, Sf)
      .collect().head
    assert(row.getLong(0) == tb._1 && row.getLong(1) == ta._1 &&
      row.getLong(2) == cb._1 && row.getLong(3) == ca._1)
    assert(row.getLong(4) == tb._2 && row.getLong(5) == ta._2 &&
      row.getLong(6) == cb._2 && row.getLong(7) == ca._2)
    assert(row.getLong(8) == ta._2 * 10000 / tb._2)
    assert(row.getLong(9) == ca._2 * 10000 / cb._2)
    assert(row.getLong(10) == ta._2 * cb._2 * 10000 / (tb._2 * ca._2))
    // the DiD is the ratio of ratios up to integer truncation: within
    // 2 bp of treated_bp * 1e4 / control_bp
    val approx = row.getLong(8) * 10000 / row.getLong(9)
    assert(math.abs(approx - row.getLong(10)) <= 2,
      s"DiD ${row.getLong(10)} vs composed $approx")
  }
}
