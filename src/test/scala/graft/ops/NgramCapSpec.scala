package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the q78 hot-shingle document-frequency cap (`maxDf`):
  *
  *  - cap = ∞ (and any cap above every shingle's df) returns EXACTLY the
  *    uncapped PPJoin output — the cap is a pure no-op until a shingle
  *    crosses it;
  *  - on a crafted hot-shingle corpus a finite cap collapses the
  *    candidate count from C(hot,2) to just the true pair, while every
  *    pair above the threshold that shares a sub-cap prefix shingle —
  *    the documented recall condition — survives with its exact Jaccard.
  */
class NgramCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 50 docs whose 2-shingle sets share the boilerplate "a b c" (df 50 —
    * the c² offender: with n = 2 the prefix keeps BOTH shingles, so the
    * hot shingle seeds C(50,2) = 1225 candidates), plus one true
    * near-dup pair (Jaccard exactly 0.5) whose overlap lives in rare
    * (df ≤ 2) shingles. */
  private lazy val hotCorpus = {
    val hot = (0 until 50).map(i => (i.toLong, s"a b c w$i"))
    val truePair = Seq((100L, "p q r s t"), (101L, "p q r s u"))
    import spark.implicits._
    (hot ++ truePair).toDF("doc_id", "text")
  }

  test("a finite cap collapses hot-block candidates to the true pair") {
    val docsets = TrainingData.ngramDocsets(hotCorpus)
    val uncapped = TrainingData.ngramCandidates(docsets, 0.5, Long.MaxValue)
      .count()
    assert(uncapped >= 1225L + 1L, s"expected the hot c² blowup, got $uncapped")
    val capped = TrainingData.ngramCandidates(docsets, 0.5, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(capped == Seq((100L, 101L)),
      s"capped candidates should be exactly the true pair, got $capped")
  }

  test("capped and uncapped FINAL output agree when true pairs share a " +
    "sub-cap shingle (hot-boilerplate pairs were below threshold anyway)") {
    val uncapped = TrainingData.ngramJaccardCore(hotCorpus, Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    val capped = TrainingData.ngramJaccardCore(hotCorpus, 10L)
      .collect().map(_.toSeq).toSeq
    assert(uncapped == capped)
    assert(uncapped.map(r => (r.head, r(1))) == Seq((100L, 101L)))
  }

  test("a cap above every df is a no-op on real data (sf0.001)") {
    val docs = T(spark, SparkTestBase.Sf0001, "documents")
    val plain = TrainingData.ngramJaccardCore(docs, Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    val highCap = TrainingData.ngramJaccardCore(docs, 1000000L)
      .collect().map(_.toSeq).toSeq
    assert(plain == highCap)
    assert(plain.nonEmpty) // the fixture corpus does contain near-dups
  }
}
