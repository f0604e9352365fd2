package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[NgramSet]] replaced q78's word-explode → lead-window →
  * collect_set build in r9; this spec keeps the replaced formulation
  * alive AS THE REFERENCE and pins (doc_id, hs, n) equality against it
  * — on the real corpus and on edge inputs — plus the xxhash64 value
  * identity (the expression calls Spark's own XXH64 with the function
  * seed; a reimplementation drift would silently change every q78
  * candidate prefix). */
class NgramSetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** The pre-r9 formulation, verbatim. */
  private def sqlDocsets(docs: DataFrame): DataFrame = {
    val wSh = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "word")
      .withColumn("w1", lead("word", 1).over(wSh))
      .withColumn("w2", lead("word", 2).over(wSh))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"),
        expr("xxhash64(concat_ws(' ', word, w1, w2))").as("hv"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("hv"))).as("hs"))
      .withColumn("n", size(col("hs")))
  }

  private def both(docs: DataFrame) = {
    import docs.sparkSession.implicits._
    val ref = sqlDocsets(docs)
      .as[(Long, Seq[Long], Int)].collect().sortBy(_._1).toSeq
    val got = docs
      .select(col("doc_id"), NgramSet.grams(col("text")).as("hs"))
      .filter(col("hs").isNotNull)
      .withColumn("n", size(col("hs")))
      .as[(Long, Seq[Long], Int)].collect().sortBy(_._1).toSeq
    (ref, got)
  }

  test("equal to the replaced explode/window/collect_set build on the " +
    "sf0.001 corpus") {
    val (ref, got) = both(graft.ops.T(spark, SparkTestBase.Sf0001, "documents"))
    assert(got == ref)
    assert(got.exists(_._3 > 10), "degenerate corpus")
  }

  test("edge inputs: sub-3-token docs absent, empty tokens, duplicate " +
    "shingles collapse, sorted ascending") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b"),               // absent
      (1L, "a b c"),             // one shingle
      (2L, "a  b  c "),          // empty tokens in shingles
      (3L, "x y z x y z x y z") // duplicate shingles collapse
    ).toDF("doc_id", "text")
    val (ref, got) = both(docs)
    assert(got == ref)
    assert(!got.exists(_._1 == 0L))
    assert(got.find(_._1 == 3L).exists(r => r._2 == r._2.sorted && r._3 < 7))
  }

  test("hash values ARE Spark's xxhash64 (seed 42), not a reimplementation") {
    import spark.implicits._
    val viaSql = Seq("a b c").toDF("t")
      .selectExpr("xxhash64('a b c') as h").as[Long].collect().head
    val viaExpr = NgramSet.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c"))
      .toLongArray.head
    assert(viaSql == viaExpr)
  }
}
