package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q306 beyond the DuckDB oracle (which states the same per-bin
  * centi-floor terms): the statistic re-derived driver-side in BigInt
  * on the real corpus, a shifted synthetic cohort that must alarm, a
  * uniform split that must not, and the critical-value clamp. */
class Chi2DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def core(counts: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    Corpus.chi2Core(counts.toDF("bin", "o1", "o2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).head
  }

  test("q306 equals the BigInt recompute on the real corpus; the " +
    "parity split does not alarm") {
    val counts = T(spark, dir, "documents")
      .selectExpr(s"n_chars div ${Corpus.Chi2BinW} as bin", "doc_id % 2 as g")
      .where("n_chars is not null")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (b, g) =>
        (b, g.count(_._2 == 0L).toLong, g.count(_._2 != 0L).toLong) }
    val n1 = BigInt(counts.map(_._2).sum)
    val n2 = BigInt(counts.map(_._3).sum)
    val x2 = counts.map { case (_, o1, o2) =>
      val d = BigInt(o1) * n2 - BigInt(o2) * n1
      (d * d * 100) / (n1 * n2 * BigInt(o1 + o2))
    }.sum
    val df = math.min(counts.size - 1, Corpus.Chi2Crit05X100.size)
    val got = graft.SparkEntry.queries("q306_chi2_drift")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).head
    assert(got._1 == counts.size.toLong && got._2 == df.toLong)
    assert(got._3 == x2.toLong, s"x2 mismatch: got ${got._3}, want $x2")
    assert(got._4 == Corpus.Chi2Crit05X100(df - 1))
    assert(!got._5, "parity split flagged as drifted")
  }

  test("a shifted cohort alarms; a proportional split stays silent; " +
    "df clamps at the table end") {
    // cohort 2's mass sits two bins higher — gross distribution shift
    val shifted = (1L to 6L).map(b => (b, 100L, 0L)) ++
      (7L to 12L).map(b => (b, 0L, 100L))
    val s1 = core(shifted)
    assert(s1._7 && s1._5 > s1._6, s"total separation must alarm: $s1")
    // identical shape, different sizes — chi-square must NOT alarm
    val prop = (1L to 12L).map(b => (b, 100L, 300L))
    val s2 = core(prop)
    assert(s2._5 == 0L && !s2._7, s"proportional split alarmed: $s2")
    // 40 bins clamp df to the 30-entry table
    val wide = (1L to 40L).map(b => (b, 50L, 50L))
    val s3 = core(wide)
    assert(s3._2 == Corpus.Chi2Crit05X100.size.toLong &&
      s3._6 == Corpus.Chi2Crit05X100.last, s"df clamp: $s3")
  }
}
