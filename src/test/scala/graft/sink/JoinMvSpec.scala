package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** q257 beyond the DuckDB oracle (which applies the deltas
  * declaratively): ROW-level equality of the maintained view against a
  * direct A′ ⋈ B′ recompute, the three-term partition (every row in
  * exactly one term), and non-vacuity — every delta class genuinely
  * fires at this SF. */
class JoinMvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def rowKey(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))

  test("maintained view row-equals the direct recompute; all delta " +
    "classes fire") {
    val got = MvRefresh.maintainedView(spark, dir)
      .select("o_orderkey", "o_custkey", "price_c2", "seg")
      .collect().map(rowKey).toSeq.sorted

    val orders = T(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("price_c2"))
    val cust = T(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val aPrime = orders
      .filter(col("o_orderkey") % MvRefresh.TombMod =!= 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("price_c2") + when(col("o_orderkey") % MvRefresh.UpdMod === 0,
          100L).otherwise(0L)).as("price_c2"))
      .unionByName(orders.filter(col("o_orderkey") % MvRefresh.InsMod === 0)
        .select((col("o_orderkey") + MvRefresh.InsOffset).as("o_orderkey"),
          col("o_custkey"), (col("price_c2") + 55L).as("price_c2")))
    val bPrime = cust.select(col("c_custkey"),
      when(col("c_custkey") % MvRefresh.CustMod === 0, lit("MOVED"))
        .otherwise(col("seg")).as("seg"))
    val want = aPrime
      .join(bPrime, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "price_c2", "seg")
      .collect().map(rowKey).toSeq.sorted

    assert(got.size == want.size, s"${got.size} vs ${want.size} rows")
    assert(got == want)

    // non-vacuity: tombstones removed rows, updates moved money,
    // inserts added keys, and the dimension move produced MOVED rows
    val baseN = orders.count()
    val nTomb = orders.filter(col("o_orderkey") % MvRefresh.TombMod === 0).count()
    val nIns = orders.filter(col("o_orderkey") % MvRefresh.InsMod === 0).count()
    assert(nTomb > 0 && nIns > 0)
    assert(got.size == baseN - nTomb + nIns)
    assert(got.exists(_._4 == "MOVED"), "no dimension move landed")
    assert(got.exists(_._1 >= MvRefresh.InsOffset), "no insert landed")
  }

  test("the three maintenance terms partition the view: kept rows are " +
    "bit-identical stored-V rows, and no key appears in two terms") {
    val v = spark.read.parquet(MvRefresh.ensureJoinMv(spark, dir))
      .select("o_orderkey", "o_custkey", "price_c2", "seg")
      .collect().map(rowKey).toSet
    val maintained = MvRefresh.maintainedView(spark, dir)
      .select("o_orderkey", "o_custkey", "price_c2", "seg")
      .collect().map(rowKey)
    // keys are unique in the maintained view (terms are disjoint)
    assert(maintained.map(_._1).distinct.length == maintained.length)
    // rows untouched by either delta must be the STORED rows verbatim
    val untouched = maintained.filter { case (ok, ck, _, _) =>
      ok % MvRefresh.UpdMod != 0 && ok % MvRefresh.TombMod != 0 &&
        ok < MvRefresh.InsOffset && ck % MvRefresh.CustMod != 0
    }
    untouched.foreach { r =>
      assert(v.contains(r), s"kept row $r is not a stored-V row")
    }
  }
}
