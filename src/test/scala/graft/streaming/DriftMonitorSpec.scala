package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.{Corpus, T}

/** Streaming drift monitor: after streaming the full corpus against
  * the doc_id % 7 ≠ 0 reference, the monitor's TVD must equal q188's
  * (same split, same integer formula); streaming exactly the reference
  * drifts 0 bp; a replayed batch id is a no-op. */
class DriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs = T(spark, SparkTestBase.Sf0001, "documents")
    .select("doc_id", "text")

  test("streamed full corpus vs %7 reference equals q188's tvd_bp; " +
    "replay is a no-op") {
    val st = DriftMonitor.init(spark,
      Files.createTempDirectory("graft-drift-").toString,
      docs.filter(col("doc_id") % 7 =!= 0))
    assert(DriftMonitor.append(spark, st, 0L,
      docs.filter(col("doc_id") % 2 === 0)))
    assert(DriftMonitor.append(spark, st, 1L,
      docs.filter(col("doc_id") % 2 =!= 0)))
    // replayed id changes nothing
    assert(!DriftMonitor.append(spark, st, 0L, docs.limit(3)))

    val got = DriftMonitor.drift(spark, st).collect()(0)
    val expected = Corpus.q188TokenDrift(spark, SparkTestBase.Sf0001)
      .select("tvd_bp").collect()(0).getLong(0)
    assert(got.getLong(0) == expected,
      s"monitor tvd ${got.getLong(0)} != q188 $expected")
    assert(got.getLong(3) == 2L, "committed batch count")
  }

  test("polling before the first batch commits reports DEFINED total " +
    "drift (10000 bp), not PATH_NOT_FOUND or NULL (r11 review)") {
    val st = DriftMonitor.init(spark,
      Files.createTempDirectory("graft-drift-pre-").toString,
      docs.filter(col("doc_id") % 7 =!= 0))
    val got = DriftMonitor.drift(spark, st).collect()(0)
    assert(got.getLong(0) == 10000L,
      s"empty seen side must read as total drift, got ${got.getLong(0)}")
    assert(got.getLong(2) == 0L && got.getLong(3) == 0L)
  }

  test("r13: the graded q227 row equals q188's tvd_bp on the shared " +
    "split and reports the 4-batch ingest (the monitor's number, not " +
    "a re-derivation)") {
    val got = Corpus.q227DriftMonitor(spark, SparkTestBase.Sf0001)
      .collect()(0)
    val expected = Corpus.q188TokenDrift(spark, SparkTestBase.Sf0001)
      .select("tvd_bp").collect()(0).getLong(0)
    assert(got.getLong(0) == expected,
      s"q227 tvd ${got.getLong(0)} != q188 $expected")
    assert(got.getLong(3) == 4L, "q227 must commit exactly 4 batches")
    // idempotent re-read (the bench-reps contract): same row again
    val again = Corpus.q227DriftMonitor(spark, SparkTestBase.Sf0001)
      .collect()(0)
    assert(again.toSeq == got.toSeq, "q227 re-read must be stable")
  }

  test("streaming exactly the reference drifts 0 bp") {
    val ref = docs.filter(col("doc_id") % 7 =!= 0)
    val st = DriftMonitor.init(spark,
      Files.createTempDirectory("graft-drift0-").toString, ref)
    assert(DriftMonitor.append(spark, st, 0L, ref))
    val got = DriftMonitor.drift(spark, st).collect()(0)
    assert(got.getLong(0) == 0L, s"self-drift ${got.getLong(0)} != 0")
  }

  test("foreachBatch stream drives the same protocol end to end") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ref = docs.filter(col("doc_id") % 7 =!= 0)
    val st = DriftMonitor.init(spark,
      Files.createTempDirectory("graft-drift-s-").toString, ref)
    val rows = docs.as[(Long, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = DriftMonitor.start(st, in.toDF().toDF("doc_id", "text"))
    try {
      rows.grouped((rows.size + 1) / 2).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = DriftMonitor.drift(spark, st).collect()(0)
    val expected = Corpus.q188TokenDrift(spark, SparkTestBase.Sf0001)
      .select("tvd_bp").collect()(0).getLong(0)
    assert(got.getLong(0) == expected)
  }
}
