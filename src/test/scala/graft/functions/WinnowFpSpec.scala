package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[WinnowFp]] replaced q85's posexplode → two-window → groupBy
  * pipeline in r9; this spec keeps the replaced pipeline alive AS THE
  * REFERENCE and pins equality against it on the real corpus and on
  * boundary inputs (exactly 8 chars = one window, 7 chars = dropped,
  * repeated text collapsing fingerprints, codepoints up to 256). */
class WinnowFpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** The pre-r9 SQL formulation, verbatim. */
  private def sqlWinnow(docs: DataFrame): DataFrame = {
    val wLead = Window.partitionBy("doc_id").orderBy("pos")
    val wMin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    docs
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), (length(col("text")) - 4).as("m"),
        posexplode(split(col("text"), "")))
      .toDF("doc_id", "m", "pos", "ch")
      .withColumn("a", ascii(col("ch")).cast("long"))
      .withColumn("h",
        col("a") * lit(4362470401L) +
          lead("a", 1).over(wLead) * lit(16974593L) +
          lead("a", 2).over(wLead) * lit(66049L) +
          lead("a", 3).over(wLead) * lit(257L) +
          lead("a", 4).over(wLead))
      .withColumn("minfp", min(col("h")).over(wMin))
      .filter(col("pos") <= col("m") - 4)
      .groupBy("doc_id")
      .agg(countDistinct(col("minfp")).as("n_fp"),
        min(col("minfp")).as("min_fp"))
  }

  private def both(docs: DataFrame): (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]) = {
    import docs.sparkSession.implicits._
    val ref = sqlWinnow(docs)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = docs
      .select(col("doc_id"), WinnowFp.winnow(col("text")).as("fp"))
      .filter(col("fp").isNotNull)
      .select(col("doc_id"), col("fp.n_fp"), col("fp.min_fp"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    (ref, got)
  }

  test("equal to the replaced explode/window pipeline on the sf0.001 corpus") {
    val (ref, got) = both(graft.ops.T(spark, SparkTestBase.Sf0001, "documents"))
    assert(got == ref)
    assert(got.nonEmpty && got.exists(_._2 > 1), "degenerate corpus")
  }

  test("boundary inputs: 7 chars dropped, 8 chars = one window, " +
    "repetition collapses fingerprints, codepoints up to 256") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abcdefg"),            // 7 chars → no full window → absent
      (1L, "abcdefgh"),           // 8 chars → exactly one window
      (2L, "aaaaaaaaaaaaaaaa"),   // all-same → n_fp = 1
      (3L, "ab" * 16),            // period-2 text → tiny fp set
      (4L, "touché café déjà vu!"), // cps ≤ 256
      (5L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val (ref, got) = both(docs)
    assert(got == ref)
    assert(!got.exists(_._1 == 0L), "7-char doc must be dropped")
    assert(got.find(_._1 == 2L).exists(_._2 == 1L))
  }

  test("codegen and interpreted agree, and q85 output is unchanged") {
    import spark.implicits._
    val viaExpr = Seq("abcdefghij").toDF("text")
      .select(WinnowFp.winnow(col("text")).as("fp"))
      .select("fp.n_fp", "fp.min_fp").as[(Long, Long)].collect().head
    val direct = WinnowFp.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abcdefghij"))
    assert((direct.getLong(0), direct.getLong(1)) == viaExpr)
  }

  test("SQL registration: winnow_fp and ngram_hash_set work in spark.sql") {
    graft.GraftExtensions.register(spark.sessionState.functionRegistry)
    import spark.implicits._
    val fp = spark.sql("SELECT winnow_fp('abcdefghij').n_fp AS n")
      .as[Long].collect().head
    assert(fp > 0)
    val ng = spark.sql("SELECT size(ngram_hash_set('a b c d')) AS n")
      .as[Int].collect().head
    assert(ng == 2)
  }
}
