package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The salted join must be a drop-in equivalent of the plain join —
  * same multiset of output rows — while spreading a hot key. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // 90% of the fact rows share key 1 (the pathological hot key)
  private def big = (1 to 2000).map { i =>
    (if (i % 10 == 0) (i % 7) + 2L else 1L, i.toLong)
  }.toDF("k", "payload")

  private def small = (1 to 10).map(i => (i.toLong, s"dim$i")).toDF("k", "name")

  test("salted join equals the plain join, duplicates included") {
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", r = 8)
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("hot key spreads across salt values") {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8L)))
    val spread = salted.filter(col("k") === 1L)
      .select("_salt").distinct().count()
    assert(spread >= 6, s"hot key landed on only $spread of 8 salts")
  }
}
