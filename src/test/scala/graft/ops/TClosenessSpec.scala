package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q307 beyond the DuckDB oracle (which states the same cross-
  * multiplied EMD): the textbook ordered-EMD re-derived driver-side in
  * BigInt per class (dense band grid, mean absolute CDF gap), the
  * derived 2×median threshold reproduced, and both verdicts present.
  * Semantic pins: a class distributed like the global reads t ≈ 0, and
  * the triad really measures three different things (a class can pass
  * k-anonymity while breaching t-closeness). */
class TClosenessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("q307 equals the BigInt EMD walk with the derived threshold; " +
    "breaches and passes both present") {
    val rows = T(spark, dir, "customer")
      .selectExpr("c_nationkey", "c_mktsegment",
        s"(cast(round(c_acctbal * 100) as bigint) + 1000000) div ${Governance.BandC2} as band")
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    val b0 = rows.map(_._2).min
    val b1 = rows.map(_._2).max
    val bands = (b0 to b1).toSeq
    val nn = BigInt(rows.length)
    val globalCum = bands.map { b =>
      b -> BigInt(rows.count(_._2 <= b)) }.toMap
    val want = rows.groupBy(_._1).map { case (cls, g) =>
      val n = BigInt(g.length)
      val num = bands.map { b =>
        val cc = BigInt(g.count(_._2 <= b))
        (cc * nn - globalCum(b) * n).abs
      }.sum
      cls -> (g.length.toLong,
        ((num * 10000) / (n * nn * BigInt(bands.length - 1))).toLong)
    }
    val med = {
      val ts = want.toSeq.map { case ((nat, seg), (_, t)) => (t, nat, seg) }
        .sorted
      ts((ts.length + 1) / 2 - 1)._1
    }
    val thr = Governance.TCloseNum * med / Governance.TCloseDen
    val got = graft.SparkEntry.queries("q307_t_closeness")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (cls, (n, t, gThr, breach)) =>
      val (wn, wt) = want(cls)
      assert(n == wn && t == wt, s"$cls: got ($n, $t), want ($wn, $wt)")
      assert(gThr == thr && breach == (t > thr), s"$cls verdict")
    }
    assert(got.values.exists(_._4), "no breach — degenerate")
    assert(got.values.exists(!_._4), "all breach — degenerate")
  }

  test("a class mirroring the global distribution reads t = 0; " +
    "skew the triad's other legs miss is exactly what t catches") {
    // the EMD walk on a crafted 3-class corpus: two large uniform
    // classes dominate the global shape; class B concentrates all its
    // mass in one band. The uniform classes must read low (they ARE
    // most of the global), B high — though every class is k-anonymous
    // by construction, which is exactly the skew k misses. (A 2-class
    // equal-size fixture would be useless: |cc·N − cg·n| is symmetric
    // between two equal classes, so both read the SAME t.)
    val bands = 1L to 4L
    val a = bands.flatMap(b => Seq.fill(10)(b))    // uniform ×10
    val c = bands.flatMap(b => Seq.fill(10)(b))    // uniform ×10
    val bcls = Seq.fill(10)(4L)                    // all in band 4
    val all = a ++ c ++ bcls
    val nn = BigInt(all.length)
    def emd(cls: Seq[Long]): Long = {
      val n = BigInt(cls.length)
      val num = bands.map { b =>
        (BigInt(cls.count(_ <= b)) * nn - BigInt(all.count(_ <= b)) * n).abs
      }.sum
      ((num * 10000) / (n * nn * BigInt(bands.length - 1))).toLong
    }
    val ta = emd(a); val tb = emd(bcls)
    assert(tb > 3 * ta, s"concentrated class must dominate: a=$ta b=$tb")
    assert(ta < 1500, s"global-shaped class should read low: $ta")
  }
}
