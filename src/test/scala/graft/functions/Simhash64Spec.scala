package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[Simhash64]] replaced the explode → md5 → conv → 64-sum-aggregate
  * SQL pipeline in r9; this spec keeps the replaced pipeline alive AS
  * THE REFERENCE and pins bit-equality against it — on the real corpus
  * and on the edge inputs (empty text, repeated separators, repeated
  * tokens voting per occurrence, multi-byte UTF-8) — plus the SQL
  * registration and the codegen/interpreted agreement. */
class Simhash64Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** The pre-r9 SQL formulation, verbatim. */
  private def sqlSimhash(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .withColumn("h", md5(col("t")))
      .select(col("doc_id") +: (0 until 4).map(j =>
        expr(s"cast(conv(substring(h, ${j * 4 + 1}, 4), 16, 10) as int)")
          .as(s"w$j")): _*)
    val bitVotes = (0 until 64).map { i =>
      val j = i / 16
      val off = 15 - (i % 16)
      sum(when(expr(s"(shiftright(w$j, $off) & 1) = 1"), 1).otherwise(-1))
        .as(s"b$i")
    }
    val votes = words.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    docs.select("doc_id")
      .join(votes, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat((0 until 64).map(i =>
          when(col(s"b$i") > 0, lit("1")).otherwise(lit("0"))): _*)
          .as("simhash"))
  }

  private def both(docs: DataFrame): (Seq[(Long, String)], Seq[(Long, String)]) = {
    import docs.sparkSession.implicits._
    val ref = sqlSimhash(docs).as[(Long, String)].collect().sortBy(_._1).toSeq
    val got = docs
      .select(col("doc_id"), Simhash64.simhash(col("text")).as("simhash"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    (ref, got)
  }

  test("bit-equal to the replaced SQL pipeline on the sf0.001 corpus") {
    val (ref, got) = both(graft.ops.T(spark, SparkTestBase.Sf0001, "documents"))
    assert(got == ref)
    assert(got.map(_._2).distinct.size > 1, "degenerate corpus")
  }

  test("edge inputs: empty text, separator runs, per-occurrence votes, " +
    "multi-byte UTF-8 tokens") {
    import spark.implicits._
    val docs = Seq(
      (0L, ""),                      // token-less → all '0'
      (1L, "   "),                   // only separators → all '0'
      (2L, "  a  b   a "),           // runs + repeated token
      (3L, "a a a b"),               // occurrence votes dominate
      (4L, "naïve 日本語 café x"),   // multi-byte UTF-8 (0x20-safe split)
      (5L, "a")                      // single token = its own bit pattern
    ).toDF("doc_id", "text")
    val (ref, got) = both(docs)
    assert(got == ref)
    assert(got.head._2 == "0" * 64, "empty doc must be all zeros")
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma alpha")).toDF("doc_id", "text")
    val fromCodegen = docs.select(Simhash64.simhash(col("text")))
      .as[String].collect().head
    val interpreted = Simhash64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "alpha beta gamma alpha")).toString
    assert(fromCodegen == interpreted)
  }

  test("SQL registration: simhash64(text) works in plain spark.sql") {
    graft.GraftExtensions.register(
      spark.sessionState.functionRegistry)
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT simhash64('alpha beta gamma alpha') AS s").as[String]
      .collect().head
    val viaColumn = Seq("alpha beta gamma alpha").toDF("text")
      .select(Simhash64.simhash(col("text"))).as[String].collect().head
    assert(viaSql == viaColumn)
  }
}
