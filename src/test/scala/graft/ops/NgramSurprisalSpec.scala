package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q214 (bigram-LM surprisal) beyond the DuckDB oracle (same bin()
  * formulation): a driver-side brute force whose ⌊log₂⌋ comes from
  * `numberOfLeadingZeros` — a DIFFERENT exact mechanism than both
  * engines' bit-length-of-binary-string — plus the model invariants:
  * surprisal is non-negative (c₂ ≤ c₁ always), every doc's bigram mass
  * is exactly its token count − 1 (the model is trained on the scored
  * corpus, so no bigram is ever out-of-vocabulary), and the score
  * discriminates (the fixture's per-doc means are not all equal). */
class NgramSurprisalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def log2(n: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(n)

  private lazy val docTokens: Map[Long, Seq[String]] =
    T(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
      .toMap

  private lazy val expected: Map[Long, (Long, Long, Long)] = {
    val bigrams = docTokens.toSeq.flatMap { case (d, w) =>
      w.sliding(2).collect { case Seq(a, b) => (d, a, b) }
    }
    val c2 = bigrams.groupBy(t => (t._2, t._3)).map { case (k, xs) => k -> xs.size.toLong }
    val c1 = bigrams.groupBy(_._2).map { case (k, xs) => k -> xs.size.toLong }
    bigrams.groupBy(_._1).map { case (d, bs) =>
      val bits = bs.map { case (_, a, b) => log2(c1(a)) - log2(c2((a, b))) }
      val s = bits.sum
      d -> ((bs.size.toLong, s, s * 10000L / bs.size))
    }
  }

  private lazy val got: Map[Long, (Long, Long, Long)] =
    TrainingData.q214NgramSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("q214 equals the numberOfLeadingZeros brute force on every doc") {
    assert(got.keySet == expected.keySet)
    got.foreach { case (d, v) =>
      assert(v == expected(d), s"doc $d: got=$v exp=${expected(d)}")
    }
  }

  test("model invariants: full bigram coverage, non-negative bits, " +
    "bounded mean, and the score actually discriminates") {
    got.foreach { case (d, (n, s, m)) =>
      assert(n == docTokens(d).size - 1L, s"doc $d bigram mass")
      assert(s >= 0L, s"doc $d negative surprisal")
      assert(m >= 0L && m <= 64L * 10000L, s"doc $d mean out of range")
    }
    val means = got.values.map(_._3)
    assert(means.max > means.min,
      "fixture degenerate: every doc equally surprising")
    // a doc made of ONE repeated bigram would score 0 mean; the fixture
    // has genuinely varied text, so the corpus mean must be positive
    assert(means.sum > 0L)
  }
}
