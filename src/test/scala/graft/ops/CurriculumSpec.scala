package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q171 curriculum ordering: the two-pass ScalableRank formulation must
  * equal the naive single-task global window (the formulation the
  * DuckDB oracle runs), buckets must be visited in strictly
  * non-increasing order along the schedule, and the bucket assignment
  * must be exactly q83's quality deciles. */
class CurriculumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val got =
    TrainingData.q171CurriculumOrder(spark, SparkTestBase.Sf0001).collect()

  test("equals the naive global-window formulation") {
    val naive = TrainingData.q83QualityScore(spark, SparkTestBase.Sf0001)
      .select(col("doc_id"),
        expr("cast(round(quality * 10000) as bigint) div 1000").as("bucket"),
        expr("cast(conv(substring(md5(concat('cur:', " +
          "cast(doc_id as string))), 1, 12), 16, 10) as bigint)").as("skey"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("bucket").desc, col("skey"), col("doc_id")))
        .cast("long"))
      .select("doc_id", "bucket", "pos")
      .orderBy("pos")
      .collect()
    assert(got.nonEmpty)
    assert(got.toSeq == naive.toSeq)
  }

  test("schedule visits buckets in non-increasing order, positions are 1..N") {
    val buckets = got.map(_.getLong(1))
    assert(buckets.zip(buckets.tail).forall { case (a, b) => a >= b })
    assert(got.map(_.getLong(2)).toSeq == (1L to got.length).toSeq)
  }

  test("bucket is the q83 quality decile") {
    val q = TrainingData.q83QualityScore(spark, SparkTestBase.Sf0001)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 10000) / 1000)
      .toMap
    got.foreach(r => assert(r.getLong(1) == q(r.getLong(0))))
  }
}
