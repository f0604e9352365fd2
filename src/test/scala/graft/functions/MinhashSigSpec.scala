package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.TrainingData

/** [[MinhashSig]] replaced the shingle-explode → dictionary-join →
  * 8-min-aggregate band pipeline in r9; this spec keeps the replaced
  * pipeline alive AS THE REFERENCE (built on the still-shipped
  * `shingleRowsOf`) and pins band-row equality against it — on the
  * real corpus and on the edge inputs the split/concat_ws contract
  * hides (sub-3-token docs, empty tokens from separator runs,
  * duplicate shingles). The hash family is load-bearing for the
  * PERSISTED q107/IngestDedup band index: a drift here would silently
  * stop new batches colliding with an existing index. */
class MinhashSigSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** The pre-r9 formulation, verbatim (dictionary + min-aggregate). */
  private def sqlBands(docs: DataFrame): DataFrame = {
    val sh = TrainingData.shingleRowsOf(docs)
    val dict = sh.select("sh").distinct()
      .select(col("sh") +: (0 until 8).map(k =>
        expr(s"cast(conv(substring(md5(concat('$k:', sh)), 1, 15), 16, 10) as bigint)")
          .as(s"h$k")): _*)
    val hashed = sh.join(dict, "sh")
    val sig = hashed.groupBy("doc_id")
      .agg(min(col("h0")).as("m0"),
        (1 until 8).map(k => min(col(s"h$k")).as(s"m$k")): _*)
    sig.select(col("doc_id"), explode(array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        col(s"m${2 * b}").as("k1"), col(s"m${2 * b + 1}").as("k2"))): _*))
      .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.k1").as("k1"), col("bk.k2").as("k2"))
  }

  private def both(docs: DataFrame) = {
    import docs.sparkSession.implicits._
    val ref = sqlBands(docs)
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val got = TrainingData.minhashBandsOfDocs(docs)
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    (ref, got)
  }

  test("band-row equal to the replaced pipeline on the sf0.001 corpus") {
    val (ref, got) = both(graft.ops.T(spark, SparkTestBase.Sf0001, "documents"))
    assert(got == ref)
    assert(got.size == got.map(_._1).distinct.size * 4, "4 bands per doc")
  }

  test("edge inputs: sub-3-token docs absent, separator runs produce " +
    "the same empty-token shingles, duplicate shingles don't perturb") {
    import spark.implicits._
    val docs = Seq(
      (0L, ""),                    // 1 token → absent
      (1L, "a b"),                 // 2 tokens → absent
      (2L, "a b c"),               // exactly one shingle
      (3L, "a  b  c"),             // empty tokens BETWEEN words
      (4L, " a b c "),             // leading/trailing empties
      (5L, "x y z x y z x y z"),   // duplicate shingles
      (6L, "w1 w2 w3 w4 w5 w6")
    ).toDF("doc_id", "text")
    val (ref, got) = both(docs)
    assert(got == ref)
    assert(!got.exists(r => r._1 == 0L || r._1 == 1L))
    assert(got.count(_._1 == 2L) == 4)
    // the separator-run docs must NOT collapse to doc 2's signature
    assert(got.filter(_._1 == 3L).map(r => (r._2, r._3, r._4)) !=
      got.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)))
  }

  test("codegen and interpreted agree") {
    import spark.implicits._
    val viaExpr = Seq("alpha beta gamma delta").toDF("text")
      .select(MinhashSig.sig(col("text")).as("m"))
      .as[Seq[Long]].collect().head
    val direct = MinhashSig.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "alpha beta gamma delta")).toLongArray.toSeq
    assert(viaExpr == direct)
    assert(direct.size == 8 && direct.forall(_ >= 0L))
  }
}
