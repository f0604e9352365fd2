package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q143–q147 (the derived-partsupp TPC-H shapes): independent
  * brute-force formulations over collected sf0.001 rows — plain Scala
  * maps and sorts instead of joins/aggregates — so a misconception
  * shared by the Spark query and its structurally similar oracle SQL
  * (both build the same psd CTE) fails here. The catalog itself is
  * re-derived with groupBy on tuples, exercising none of the SQL
  * engines' aggregation paths. */
class TpchPartsuppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  private def cents(x: Double): Long = math.round(x * 100)

  /** (partkey, suppkey) -> (min price c2, total shipped qty). */
  private lazy val psd: Map[(Long, Long), (Long, Long)] = {
    import spark.implicits._
    spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .as[(Long, Long, Double, Double)].collect()
      .groupBy(l => (l._1, l._2)).view
      .mapValues(ls => (ls.map(l => cents(l._3)).min,
        ls.map(l => math.round(l._4)).sum))
      .toMap
  }

  /** suppkey -> nation name. */
  private lazy val supNation: Map[Long, String] = {
    import spark.implicits._
    val nat = spark.read.parquet(s"$Sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name")
      .as[(Int, String)].collect().toMap
    spark.read.parquet(s"$Sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey")
      .as[(Long, Int)].collect().map { case (sk, nk) => sk -> nat(nk) }.toMap
  }

  test("q143 matches a brute-force regional min-cost search (ties kept)") {
    import spark.implicits._
    val regionOf = spark.read.parquet(s"$Sf/region.parquet")
      .selectExpr("r_regionkey", "r_name").as[(Int, String)].collect().toMap
    val natRegion = spark.read.parquet(s"$Sf/nation.parquet")
      .selectExpr("n_nationkey", "n_regionkey")
      .as[(Int, Int)].collect().map { case (nk, rk) => nk -> regionOf(rk) }
      .toMap
    val sup = spark.read.parquet(s"$Sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .as[(Long, String, Int, Double)].collect()
      .filter(s => natRegion(s._3) == "EUROPE")
      .map(s => s._1 -> ((s._2, supNation(s._1), cents(s._4)))).toMap
    val parts = spark.read.parquet(s"$Sf/part.parquet")
      .selectExpr("p_partkey", "p_type", "p_size")
      .as[(Long, String, Int)].collect()
      .filter(p => p._2 == "STANDARD" && p._3 >= 25).map(_._1).toSet
    val cand = psd.toSeq.collect {
      case ((pk, sk), (cost, _)) if parts(pk) && sup.contains(sk) =>
        val (name, natName, bal) = sup(sk)
        (bal, name, natName, pk, cost)
    }
    val minCost = cand.groupBy(_._4).view.mapValues(_.map(_._5).min).toMap
    val expected = cand.filter(c => c._5 == minCost(c._4))
      .sortBy(c => (-c._1, c._3, c._2, c._4)).take(100)
    val got = TpchShapes.q143MinCostSupplier(spark, Sf)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "no EUROPE STANDARD-part suppliers — degenerate")
  }

  test("q144 matches a brute-force per-(nation, year) profit sum") {
    import spark.implicits._
    val boltParts = spark.read.parquet(s"$Sf/part.parquet")
      .selectExpr("p_partkey", "p_name").as[(Long, String)].collect()
      .filter(_._2.contains("bolt")).map(_._1).toSet
    val orderYear = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_orderkey", "o_orderdate")
      .as[(Long, Timestamp)].collect()
      .map { case (ok, d) => ok -> d.toLocalDateTime.getYear }.toMap
    val expected = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .filter(l => boltParts(l._2))
      .map { l =>
        val profit = cents(l._5) * (100L - cents(l._6)) -
          psd((l._2, l._3))._1 * math.round(l._4) * 100L
        ((supNation(l._3), orderYear(l._1)), profit)
      }
      .groupMapReduce(_._1)(_._2)(_ + _)
      .toSeq.map { case ((n, y), p) => (n, y, p) }
      .sortBy { case (n, y, _) => (n, -y) }
    val got = TpchShapes.q144NationProfit(spark, Sf)
      .as[(String, Int, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._1).distinct.size > 1, "single-nation fixture — weak")
  }

  test("q145 matches a brute-force above-2x-average-value filter") {
    import spark.implicits._
    val perPart = psd.toSeq.collect {
      case ((pk, sk), (cost, avail)) if supNation(sk) == "NATION_15" =>
        pk -> cost * avail
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val total = perPart.values.sum
    val n = perPart.size.toLong
    val expected = perPart.toSeq
      .filter { case (_, v) => v * n > 2L * total }
      .sortBy { case (pk, v) => (-v, pk) }
    val got = TpchShapes.q145ImportantStock(spark, Sf)
      .as[(Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size < perPart.size,
      s"threshold degenerate: ${got.size} of ${perPart.size} parts kept")
  }

  test("q146 matches a brute-force excluded-supplier distinct count") {
    import spark.implicits._
    val excl = supNation.collect {
      case (sk, n) if n == "NATION_3" => sk
    }.toSet
    val partAttrs = spark.read.parquet(s"$Sf/part.parquet")
      .selectExpr("p_partkey", "p_brand", "p_type", "p_size")
      .as[(Long, String, String, Int)].collect()
      .filter(p => p._2 != "Brand#1" && p._3 != "PROMO" &&
        Set(1, 9, 14, 19, 23, 36, 45, 49)(p._4))
      .map(p => p._1 -> ((p._2, p._3, p._4))).toMap
    val expected = psd.keySet.toSeq.collect {
      case (pk, sk) if partAttrs.contains(pk) && !excl(sk) =>
        (partAttrs(pk), sk)
    }.distinct.groupMapReduce(_._1)(_ => 1L)(_ + _)
      .toSeq.map { case ((b, t, z), c) => (b, t, z, c) }
      .sortBy { case (b, t, z, c) => (-c, b, t, z) }
    val got = TpchShapes.q146SupplierCnt(spark, Sf)
      .as[(String, String, Int, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "all (brand,type,size) cells excluded — degenerate")
  }

  test("q147 matches a brute-force 1997-concentration culprit search") {
    import spark.implicits._
    val widgetParts = spark.read.parquet(s"$Sf/part.parquet")
      .selectExpr("p_partkey", "p_name").as[(Long, String)].collect()
      .filter(_._2.contains("widget")).map(_._1).toSet
    val lo = Timestamp.valueOf("1997-01-01 00:00:00")
    val hi = Timestamp.valueOf("1998-01-01 00:00:00")
    val qty97 = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .as[(Long, Long, Double, Timestamp)].collect()
      .filter(l => !l._4.before(lo) && l._4.before(hi))
      .groupMapReduce(l => (l._1, l._2))(l => math.round(l._3))(_ + _)
    val culprits = qty97.collect {
      case ((pk, sk), q) if widgetParts(pk) && 2L * q > psd((pk, sk))._2 =>
        sk
    }.toSet
    val expected = spark.read.parquet(s"$Sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_name").as[(Long, String)].collect()
      .filter(s => supNation(s._1) == "NATION_18" && culprits(s._1))
      .sortBy(_._2).toSeq
    val got = TpchShapes.q147PromotionSuppliers(spark, Sf)
      .as[(Long, String)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "no NATION_18 culprit — fixture degenerate")
  }
}
