package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q253 beyond the DuckDB oracle (which states the same rungs): an
  * independent driver-side ladder brute force, the partition
  * conservation every rung must satisfy, and the decision contract —
  * `chosen` is the MINIMAL satisfying rung and the top rung always
  * satisfies. */
class GeneralizeLadderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val rows =
    graft.SparkEntry.queries("q253_generalize_ladder")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .sortBy(_._1)

  private lazy val cust = {
    val nat = T(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    T(spark, dir, "customer")
      .select("c_nationkey", "c_mktsegment", "c_acctbal")
      .collect().map { r =>
        val nk = r.getInt(0)
        val balp = math.round(r.getDouble(2) * 100) + 1000000L
        (nk, nat(nk), r.getString(1), balp)
      }
  }

  private def bruteRung(lvl: Int): (Long, Long, Long, Long) = {
    val b = Seq(100000L, 400000L, 1600000L, 6400000L)
    val classes = cust.groupBy { case (nk, rk, seg, balp) =>
      lvl match {
        case 0 => s"$nk|$seg|${balp / b(0)}"
        case 1 => s"$nk|$seg|${balp / b(1)}"
        case 2 => s"$rk|$seg|${balp / b(2)}"
        case 3 => s"$rk|${balp / b(3)}"
        case 4 => "*"
      }
    }.view.mapValues(_.size.toLong).toMap
    (classes.size.toLong,
      classes.values.count(_ < 5L).toLong,
      classes.values.filter(_ < 5L).sum,
      classes.values.sum)
  }

  test("every rung equals the driver-side brute force") {
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    rows.foreach { case (lvl, nc, nv, risk, n, _, _) =>
      assert((nc, nv, risk, n) == bruteRung(lvl), s"rung $lvl diverged")
    }
  }

  test("conservation: every rung's classes partition the table") {
    val total = cust.length.toLong
    rows.foreach { case (lvl, _, _, _, n, _, _) =>
      assert(n == total, s"rung $lvl lost/duplicated rows")
    }
  }

  test("decision contract: chosen is the minimal satisfying rung; the " +
    "full generalization always satisfies; both verdicts fire") {
    val top = rows.last
    assert(top._2 == 1L && top._6, "L4 must be one satisfied class")
    val firstOk = rows.find(_._6).get._1
    rows.foreach { case (lvl, _, _, risk, _, meets, chosen) =>
      assert(meets == (risk == 0L))
      assert(chosen == (lvl == firstOk))
    }
    assert(rows.exists(!_._6),
      "no violating rung at this SF — the ladder pins nothing")
    assert(rows.count(_._7) == 1)
  }
}
