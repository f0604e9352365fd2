package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q170 tokenizer fertility: the per-language rollup must be exactly
  * the sum of q84's per-document counts (both denominations share the
  * q84 contracts), and the ratios must follow Exact.r4's integer
  * half-up on those sums — recomputed driver-side here, independently
  * of the Spark expression tree. */
class TokenizerFertilitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def r4(num: Long, den: Long): Double =
    ((2 * num * 10000 + den) / (2 * den)).toDouble / 10000.0

  test("q170 rolls up q84's per-doc counts; ratios are r4 of the sums") {
    val perDoc = TrainingData.q84TokenCount(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) // id, ws, bpe
      .toSeq
    val langOf = T(spark, SparkTestBase.Sf0001, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2).length.toLong)))
      .toMap

    val expect = perDoc.groupBy { case (id, _, _) => langOf(id)._1 }
      .map { case (lang, rs) =>
        val ws = rs.map(_._2).sum
        val bp = rs.map(_._3).sum
        val ch = rs.map(r => langOf(r._1)._2).sum
        lang -> (rs.size.toLong, bp, ws, ch, r4(bp, ws), r4(ch, bp))
      }

    val got = TrainingData
      .q170TokenizerFertility(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))
      .toMap

    assert(got.keySet == expect.keySet)
    assert(got.nonEmpty)
    expect.foreach { case (lang, e) => assert(got(lang) == e, lang) }
  }

  test("fertility >= 1: space-prefixed pieces never span two words") {
    val bad = TrainingData
      .q170TokenizerFertility(spark, SparkTestBase.Sf0001)
      .filter("fertility < 1.0").count()
    assert(bad == 0)
  }
}
