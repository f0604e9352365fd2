package graft.ops

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q254 beyond the DuckDB oracle (which states the same windows): an
  * independent driver-side recompute — MessageDigest ticket, sorted
  * lower median, arithmetic fill identity — and the fixture checks
  * that make the op non-vacuous (missing rows exist in every
  * segment). */
class ImputeMedianSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def missing(key: Long): Boolean = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"miss:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16) % 7 == 0
  }

  test("q254 equals the driver-side recompute; fill identity holds; " +
    "every segment genuinely has missing rows") {
    val raw = T(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 100)))

    val bySeg = raw.groupBy(_._2)
    val want = bySeg.map { case (seg, rows) =>
      val (miss, present) = rows.partition(r => missing(r._1))
      val sorted = present.map(_._3).sorted
      val med = sorted((sorted.length + 1) / 2 - 1)
      seg -> (rows.length.toLong, miss.length.toLong, med,
        present.map(_._3).sum, present.map(_._3).sum + miss.length * med)
    }

    val got = graft.SparkEntry.queries("q254_impute_median")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap

    assert(got.keySet == want.keySet)
    want.foreach { case (seg, w) =>
      assert(got(seg) == w, s"segment $seg: got ${got(seg)}, brute $w")
      assert(w._2 > 0, s"segment $seg has no missing rows — fixture pins nothing")
    }
    // the fill identity the aggregate must satisfy by construction
    got.values.foreach { case (_, nMiss, med, before, after) =>
      assert(after == before + nMiss * med)
    }
  }
}
