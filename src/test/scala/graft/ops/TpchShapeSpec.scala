package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Independent-formulation cross-checks for the r7 relational/sequence
  * additions (q120/q121/q122): plain-Scala brute force over collected
  * sf0.001 rows — sorts, hash-maps, and BigInt arithmetic instead of
  * joins/windows — so a misconception shared by the Spark query and its
  * structurally similar oracle SQL would fail here. */
class TpchShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  private def cents(x: Double): Long = math.round(x * 100)

  test("q120 matches a brute-force per-user sorted-stream transition count") {
    import spark.implicits._
    val ev = T.events(spark, Sf)
      .selectExpr("user_id", "event_id", "tus", "event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.groupMapReduce(identity)(_ => 1L)(_ + _)

    val got = NorthStar.q120EventTransitions(spark, Sf)
      .as[(String, String, Long)].collect()
      .map { case (f, t, n) => (f, t) -> n }.toMap
    assert(got == expected)
    assert(got.keysIterator.map(_._1).toSet.size > 1, "degenerate fixture")
  }

  test("q121 matches a brute-force 3-way join + top-10 (exact c4 revenue)") {
    import spark.implicits._
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment")
      .as[(Long, String)].collect().filter(_._2 == "BUILDING").map(_._1).toSet
    val cut = java.sql.Timestamp.valueOf("1996-07-01 00:00:00")
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
      .filter(o => o._3.before(cut) && cust(o._2))
      .map(o => o._1 -> ((o._3, o._4))).toMap
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
      .as[(Long, java.sql.Timestamp, Double, Double)].collect()
      .filter(l => l._2.after(cut) && orders.contains(l._1))
    val expected = li.groupBy(_._1).map { case (ok, ls) =>
      val rev = ls.map(l => cents(l._3) * (100L - cents(l._4))).sum
      val (od, op) = orders(ok)
      (ok, rev, od, op)
    }.toSeq.sortBy(r => (-r._2, r._1)).take(10)

    val got = Relational.q121ShippingPriority(spark, Sf)
      .as[(Long, Long, java.sql.Timestamp, String)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "empty top-10 — filters killed the fixture")
  }

  test("q122 matches a brute-force 6-way local-supplier rollup") {
    import spark.implicits._
    val asiaKey = spark.read.parquet(s"$Sf/region.parquet")
      .selectExpr("r_regionkey", "r_name").as[(Int, String)].collect()
      .find(_._2 == "ASIA").get._1
    val nations = spark.read.parquet(s"$Sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name", "n_regionkey")
      .as[(Int, String, Int)].collect()
      .filter(_._3 == asiaKey).map(n => n._1 -> n._2).toMap
    val custNation = spark.read.parquet(s"$Sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect()
      .filter(c => nations.contains(c._2)).toMap
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val orderCust = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(o => !o._3.before(lo) && o._3.before(hi) &&
        custNation.contains(o._2))
      .map(o => o._1 -> o._2).toMap
    val suppNation = spark.read.parquet(s"$Sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey").as[(Long, Int)].collect().toMap
    val expected = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .as[(Long, Long, Double, Double)].collect().toSeq
      .flatMap { case (ok, sk, price, disc) =>
        for {
          ck <- orderCust.get(ok)
          nk = custNation(ck)
          snk <- suppNation.get(sk) if snk == nk
        } yield nations(nk) -> (cents(price) * (100L - cents(disc)))
      }
      .groupMapReduce(_._1)(_._2)(_ + _)
      .toSeq.sortBy(r => (-r._2, r._1))

    val got = Relational.q122LocalSupplierVolume(spark, Sf)
      .as[(String, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "no local supply chains in fixture — vacuous")
  }

  test("q124 matches a brute-force per-part avg threshold rollup") {
    import spark.implicits._
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double, Double)].collect().toSeq
    val brand = spark.read.parquet(s"$Sf/part.parquet")
      .selectExpr("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    val avgQty = li.groupBy(_._1).map { case (pk, ls) =>
      pk -> ls.map(_._2).sum / ls.size
    }
    val expected = li
      .filter(l => l._2 < 0.2 * avgQty(l._1))
      .groupBy(l => brand(l._1))
      .map { case (b, ls) =>
        (b, ls.map(l => cents(l._3) * (100L - cents(l._4))).sum, ls.size.toLong)
      }.toSeq.sortBy(_._1)

    val got = Relational.q124SmallQtyRevenue(spark, Sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._3).sum > 0, "threshold filtered everything — vacuous")
  }

  test("q125 matches a brute-force having-filter join-back top-100") {
    import spark.implicits._
    val sumQty = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_quantity").as[(Long, Double)].collect()
      .groupMapReduce(_._1)(_._2)(_ + _)
      .map { case (ok, s) => ok -> s.toLong }.filter(_._2 > 150)
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
      .selectExpr("c_custkey", "c_name").as[(Long, String)].collect().toMap
    val expected = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect().toSeq
      .filter(o => sumQty.contains(o._1))
      .map { o =>
        val tp = math.rint(o._4 * 100) / 100
        (cust(o._2), o._2, o._1, o._3, tp, sumQty(o._1))
      }
      .sortBy(r => (-r._5, r._3)).take(100)

    val got = Relational.q125BigOrderCustomers(spark, Sf)
      .as[(String, Long, Long, java.sql.Timestamp, Double, Long)]
      .collect().toSeq
    assert(got == expected)
    assert(got.size == 100, s"only ${got.size} qualifying orders — raise fixture signal")
  }

  test("q126 matches a brute-force count-of-counts with zero-order customers") {
    import spark.implicits._
    val perCust = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderpriority").as[(Long, String)].collect()
      .filter(_._2 != "1-URGENT")
      .groupMapReduce(_._1)(_ => 1L)(_ + _)
    val expected = spark.read.parquet(s"$Sf/customer.parquet")
      .selectExpr("c_custkey").as[Long].collect().toSeq
      .map(ck => perCust.getOrElse(ck, 0L))
      .groupMapReduce(identity)(_ => 1L)(_ + _)
      .toSeq.map { case (cc, n) => (cc, n) }
      .sortBy(r => (-r._2, -r._1))

    val got = Relational.q126OrderCountDistribution(spark, Sf)
      .as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // Every customer appears in exactly one bucket — an inner join would
    // silently drop zero-order customers from the distribution.
    val nCust = spark.read.parquet(s"$Sf/customer.parquet").count()
    assert(got.map(_._2).sum == nCust)
    assert(got.size > 1, "degenerate one-bucket distribution")
  }

  test("q126 keeps customers whose only orders are urgent (count 0 bucket)") {
    // The sf0.001 fixture happens to have no zero-count customers, so the
    // LEFT-join-with-ON-condition contract — they must appear with count
    // 0, NOT vanish — is driven on a purpose-built table pair.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q126").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(
      (10L, 1L, "1-URGENT"),   // cust 1: urgent only -> count 0
      (11L, 2L, "5-LOW"),      // cust 2: one counted order
      (12L, 2L, "1-URGENT"),   // ...urgent one excluded
      (13L, 3L, "3-MEDIUM"),   // cust 3: two counted orders
      (14L, 3L, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = Relational.q126OrderCountDistribution(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got.toSet == Set((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("q127 matches a brute-force anti-join + threshold rollup") {
    import spark.implicits._
    val cut = java.sql.Timestamp.valueOf("2001-01-01 00:00:00")
    val activeCust = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .filter(o => !o._2.before(cut)).map(_._1).toSet
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey", "c_acctbal")
      .as[(Long, Int, Double)].collect().toSeq
      .map(c => (c._1, c._2, cents(c._3)))
    val pos = cust.map(_._3).filter(_ > 0)
    val thr = pos.sum.toDouble / pos.size
    val expected = cust
      .filter(c => !activeCust(c._1) && c._3 > thr)
      .groupBy(_._2).map { case (nk, cs) =>
        (nk, cs.size.toLong, cs.map(_._3).sum)
      }.toSeq.sortBy(_._1)

    val got = Relational.q127IdleCustomers(spark, Sf)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._2).sum > 0, "no idle high-balance customers — vacuous")
  }

  test("q128 matches a brute-force per-year market-share matrix") {
    import spark.implicits._
    val nations = spark.read.parquet(s"$Sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name", "n_regionkey")
      .as[(Int, String, Int)].collect().toSeq
    val eurKey = spark.read.parquet(s"$Sf/region.parquet")
      .selectExpr("r_regionkey", "r_name").as[(Int, String)].collect()
      .find(_._2 == "EUROPE").get._1
    val eurNations = nations.filter(_._3 == eurKey).map(_._1).toSet
    val nationName = nations.map(n => n._1 -> n._2).toMap
    val eurCust = spark.read.parquet(s"$Sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect()
      .filter(c => eurNations(c._2)).map(_._1).toSet
    val orderYear = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "cast(year(o_orderdate) as int)")
      .as[(Long, Long, Int)].collect()
      .filter(o => eurCust(o._2)).map(o => o._1 -> o._3).toMap
    val suppNation = spark.read.parquet(s"$Sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey").as[(Long, Int)].collect()
      .map(s => s._1 -> nationName(s._2)).toMap
    val revCells = spark.read.parquet(s"$Sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .as[(Long, Long, Double, Double)].collect().toSeq
      .flatMap { case (ok, sk, price, disc) =>
        orderYear.get(ok).map(y =>
          (y, suppNation(sk)) -> (cents(price) * (100L - cents(disc))))
      }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val yearTotal = revCells.toSeq.groupMapReduce(_._1._1)(_._2)(_ + _)
    val expected = revCells.toSeq.map { case ((y, n), r) =>
      val share = math.rint(r.toDouble / yearTotal(y) * 10000) / 10000
      (y, n, r, share)
    }.sortBy(r => (r._1, r._2))

    val got = Relational.q128MarketShare(spark, Sf)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._1).distinct.size > 1 && got.map(_._2).distinct.size > 1,
      "degenerate market-share matrix")
  }
}
