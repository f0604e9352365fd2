package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q237 (k-anonymity audit) beyond the DuckDB oracle: a driver-side
  * recomputation of the quasi-identifier equivalence classes and the
  * per-segment rollup, totality (every customer row lands in exactly
  * one class), and that BOTH verdict branches genuinely fire on the
  * fixture (violating and non-violating classes exist). */
class KAnonymitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** (segment, nation, band) -> class size, rebuilt driver-side with
    * the same offset-positive band division. */
  private lazy val classes: Map[(String, Int, Long), Long] =
    T(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("c2"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), (r.getLong(2) + 1000000L) / 100000L))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private lazy val got =
    Governance.q237KAnonymity(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap

  test("q237 equals the driver-side class brute force, per segment") {
    val segs = classes.keys.map(_._1).toSeq.distinct
    assert(got.keySet == segs.toSet)
    segs.foreach { seg =>
      val cs = classes.filter(_._1._1 == seg).values.toSeq
      val expect = (cs.size.toLong,
        cs.count(_ < Governance.KAnon).toLong,
        cs.filter(_ < Governance.KAnon).sum,
        cs.sum)
      assert(got(seg) == expect, s"segment $seg")
    }
  }

  test("totality: class sizes partition the table — n_rows sums to the " +
    "customer count; rows_at_risk never exceeds n_rows") {
    val total = T(spark, dir, "customer").count()
    assert(got.values.map(_._4).sum == total)
    got.foreach { case (seg, (_, _, risk, rows)) =>
      assert(risk <= rows, s"segment $seg")
    }
  }

  test("both verdict branches fire at the graded scale: sf0.01 has " +
    "violating AND k-safe classes (a gate that can only say one thing " +
    "gates nothing; sf0.001's 150 rows are all-violating by pigeonhole)") {
    assert(classes.values.exists(_ < Governance.KAnon))
    assert(got.values.map(_._2).sum ==
      classes.values.count(_ < Governance.KAnon).toLong)
    val graded = Governance.q237KAnonymity(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(graded.exists { case (nc, nv) => nv > 0 }, "no violating class")
    assert(graded.exists { case (nc, nv) => nc > nv }, "no k-safe class")
  }

  test("q270 equals the driver-side diversity brute force, per nation") {
    val cells = T(spark, dir, "customer")
      .select(col("c_nationkey"),
        expr("cast(round(c_acctbal * 100) as bigint)"), col("c_mktsegment"))
      .collect()
      .map(r => ((r.getInt(0), (r.getLong(1) + 1000000L) / 100000L),
        r.getString(2)))
      .groupBy(_._1)
      .map { case (k, rs) =>
        (k._1, rs.size.toLong, rs.map(_._2).distinct.size.toLong) }
      .toSeq
    val want = cells.groupBy(_._1).map { case (nk, cs) =>
      nk -> (cs.size.toLong,
        cs.count(_._3 >= Governance.LDiv).toLong,
        cs.filter(_._3 < Governance.LDiv).map(_._2).sum,
        cs.map(_._3).min,
        cs.map(_._2).sum) }
    val got = Governance.q270LDiversity(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
  }

  test("q270's reason to exist fires at the graded scale: sf0.01 has a " +
    "class that IS k-anonymous yet NOT l-diverse (the homogeneity attack " +
    "k-anonymity cannot see), plus diverse classes") {
    val graded = T(spark, "/root/testdata/sf0.01", "customer")
      .select(col("c_nationkey"),
        expr("cast(round(c_acctbal * 100) as bigint)"), col("c_mktsegment"))
      .collect()
      .map(r => ((r.getInt(0), (r.getLong(1) + 1000000L) / 100000L),
        r.getString(2)))
      .groupBy(_._1).toSeq // toSeq: mapping a Map to (n, l) pairs would
      .map { case (_, rs) => // rebuild a Map keyed on n, collapsing classes
        (rs.size.toLong, rs.map(_._2).distinct.size.toLong) }
    assert(graded.exists { case (n, l) =>
      n >= Governance.KAnon && l < Governance.LDiv },
      "no k-anonymous-but-homogeneous class — the attack surface is absent")
    assert(graded.exists(_._2 >= Governance.LDiv), "no diverse class at all")
    assert(graded.exists(_._2 < Governance.LDiv), "every class diverse — " +
      "the audit can only say one thing")
  }

  test("negative balances stay in contract: the +10^6 offset keeps every " +
    "band dividend positive, so div and floor agree") {
    val minC2 = T(spark, dir, "customer")
      .agg(min(expr("cast(round(c_acctbal * 100) as bigint)")))
      .collect().head.getLong(0)
    assert(minC2 + 1000000L > 0, s"offset no longer covers min cents $minC2")
  }
}
