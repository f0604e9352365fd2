package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** The clustered layout must actually deliver its promise: every output
  * file covers a disjoint key range (⇒ parquet min/max file skipping
  * works for key predicates downstream). */
class ClusteredWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("range-clustered files have disjoint, sorted key ranges") {
    val out = Files.createTempDirectory("clustered-").toString
    ClusteredWrite.parquet(
      T(spark, SparkTestBase.Sf0001, "lineitem"), out, 4, col("l_orderkey"))

    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(parts.length == 4)

    // per-file [min, max] of the cluster key must not overlap
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p)
        .agg(min("l_orderkey"), max("l_orderkey")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, ranges.toSeq)
      case _ =>
    }

    // nothing lost, and a key predicate reads back correctly
    val back = spark.read.parquet(out)
    assert(back.count() ==
      T(spark, SparkTestBase.Sf0001, "lineitem").count())
    assert(back.filter(col("l_orderkey") === 1L).count() ==
      T(spark, SparkTestBase.Sf0001, "lineitem")
        .filter(col("l_orderkey") === 1L).count())
  }
}
