package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q166/q167 beyond the DuckDB oracle: driver-side recomputation of
  * the data-card metrics and the snapshot-diff partition property.
  */
class DataCardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("q166 metrics equal the brute-force datasheet") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val r = Corpus.q166DataCard(spark, dir).head
    assert(r.getLong(0) == docs.length)
    assert(r.getLong(1) == docs.map(_._1).distinct.length)
    assert(r.getLong(2) == docs.map(_._2).distinct.length)
    assert(r.getLong(3) ==
      docs.map(_._3.split(" ").count(_.nonEmpty).toLong).sum)
    val btoks = docs.map(d => graft.functions.Bpe.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(d._3)))
    assert(r.getLong(4) == btoks.sum)
    assert(r.getLong(5) == docs.length - docs.map(_._3).distinct.length)
    assert(r.getLong(6) == btoks.max)
  }

  test("q167 statuses partition the id universe of both snapshots, and " +
    "each class is exactly its generator set") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Corpus.q167SnapshotDiff(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val removed = ids.count(_ % 13 == 0)
    val added = ids.count(_ % 29 == 0)
    val changed = ids.count(i => i % 13 != 0 && i % 17 == 0)
    assert(got("removed") == removed)
    assert(got("added") == added)
    assert(got("changed") == changed)
    assert(got("unchanged") == ids.size - removed - changed)
    assert(got.values.sum == ids.size + added)
  }
}
