package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q155 (n-gram novelty / OOV-rate quality gate) beyond the DuckDB
  * oracle: hand-computable fixtures pin the counting contract (bigram
  * multiplicity, reference-slice membership, the r4 integer rounding),
  * and invariants run over the real sf0.001 corpus.
  */
class OovNoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Curation.oovNovelty(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
  }

  test("hand-computed fixture: multiplicity counts, exact ratios, the " +
    "novelty flag, and reference docs excluded from the output") {
    // reference slice = doc_id % 10 == 0: docs 0 and 10.
    // Reference bigrams: {a b, b c} (doc 0), {x y} (doc 10).
    val out = run(Seq(
      0L -> "a b c", // reference — never scored
      10L -> "x y", // reference — never scored
      1L -> "a b c", // both bigrams seen → 0/2
      2L -> "a b q", // "a b" seen, "b q" novel → 1/2
      3L -> "q q q q", // "q q" ×3, all novel → 3/3
      4L -> "a b a b", // "a b"×2 seen, "b a" novel → 1/3
      5L -> "solo" // no bigram → dropped
    ))
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((2L, 0L, 0.0, false)))
    assert(out(2L) == ((2L, 1L, 0.5, false))) // 0.5 is NOT > 0.5
    assert(out(3L) == ((3L, 3L, 1.0, true)))
    // 1/3 under r4 integer rounding: (2*1*10000 + 3) div 6 = 3333(.83→)
    assert(out(4L) == ((3L, 1L, 0.3333, false)))
  }

  test("empty-word contract matches q96: runs of spaces collapse, so " +
    "bigrams pair adjacent surviving words across them") {
    val out = run(Seq(20L -> "a  b", 1L -> "a   b"))
    // doc 20 is reference with bigram "a b"; doc 1's "a b" is seen.
    assert(out(1L) == ((1L, 0L, 0.0, false)))
  }

  test("sf0.001 invariants: n_oov <= n_bigrams, n_bigrams >= 1, no " +
    "reference doc scored, ratio equals the r4 rational") {
    val rows = Curation
      .q155OovNovelty(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nbg, noov, ratio) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(id % 10 != 0)
      assert(nbg >= 1 && noov >= 0 && noov <= nbg)
      val expect = ((2 * noov * 10000 + nbg) / (2 * nbg)).toDouble / 10000.0
      assert(ratio == expect, s"doc $id")
      assert(r.getBoolean(4) == (ratio > 0.5))
    }
  }
}
