package graft.ops

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The shared commit-log protocol pinned at the HELPER level (its two
  * consumers — IncrementalCard, DriftMonitor — pin it end-to-end; a
  * third consumer gets these guarantees without re-earning them):
  * torn writes invisible, replayed writes replace (never duplicate),
  * missing/empty paths read as empty frames. */
class BatchCommitLogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val Ddl = "k STRING, v BIGINT, batch_id BIGINT"

  private def dirs(): (String, String) = {
    val root = Files.createTempDirectory("graft-bcl-").toString
    (s"$root/data", s"$root/batches")
  }

  test("readCommitted is total on a never-written state and hides a " +
    "torn (unrecorded) write until its batch commits") {
    import spark.implicits._
    val (data, batches) = dirs()
    // nothing written at all → empty, not PATH_NOT_FOUND
    assert(BatchCommitLog.readCommitted(spark, data, batches, Ddl)
      .count() == 0)
    assert(!BatchCommitLog.isCommitted(spark, batches, 0L))
    // torn write: data lands, record never does
    BatchCommitLog.writePartitioned(
      Seq(("a", 1L)).toDF("k", "v"), 0L, data)
    assert(BatchCommitLog.readCommitted(spark, data, batches, Ddl)
      .count() == 0, "uncommitted partition leaked")
    // commit point flips visibility
    BatchCommitLog.record(spark, batches, 0L)
    assert(BatchCommitLog.isCommitted(spark, batches, 0L))
    assert(BatchCommitLog.readCommitted(spark, data, batches, Ddl)
      .count() == 1)
  }

  test("a replayed write REPLACES its own partition (no duplicates) " +
    "and leaves other batches' partitions untouched") {
    import spark.implicits._
    val (data, batches) = dirs()
    BatchCommitLog.writePartitioned(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), 0L, data)
    BatchCommitLog.record(spark, batches, 0L)
    BatchCommitLog.writePartitioned(
      Seq(("c", 3L)).toDF("k", "v"), 1L, data)
    BatchCommitLog.record(spark, batches, 1L)
    // replay batch 0 with different content — the crash-rerun shape
    BatchCommitLog.writePartitioned(
      Seq(("a", 10L)).toDF("k", "v"), 0L, data)
    val rows = BatchCommitLog.readCommitted(spark, data, batches, Ddl)
      .select("k", "v", "batch_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(rows.toSeq == Seq(("a", 10L, 0L), ("c", 3L, 1L)),
      s"replay must replace, not append: ${rows.toSeq}")
  }

  test("an EMPTY batch write (no rows) reads back as empty, not a " +
    "schema-inference failure") {
    import spark.implicits._
    val (data, batches) = dirs()
    BatchCommitLog.writePartitioned(
      Seq.empty[(String, Long)].toDF("k", "v"), 0L, data)
    BatchCommitLog.record(spark, batches, 0L)
    assert(BatchCommitLog.readCommitted(spark, data, batches, Ddl)
      .count() == 0)
  }

  test("compact collapses the per-batch files to one, preserves the id " +
    "set, and later records stay readable") {
    import spark.implicits._
    val (data, batches) = dirs()
    (0L to 9L).foreach { b =>
      BatchCommitLog.writePartitioned(
        Seq(("k", b)).toDF("k", "v"), b, data)
      BatchCommitLog.record(spark, batches, b)
    }
    def parquetFiles(): Long = Files
      .list(java.nio.file.Paths.get(batches)).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet")).toLong
    assert(parquetFiles() == 10)
    BatchCommitLog.compact(spark, batches)
    assert(parquetFiles() == 1, "compaction must leave one parquet file")
    assert(BatchCommitLog.committed(spark, batches)
      .as[Long].collect().sorted.toSeq == (0L to 9L))
    // the log keeps working after compaction
    BatchCommitLog.writePartitioned(Seq(("k", 10L)).toDF("k", "v"), 10L, data)
    BatchCommitLog.record(spark, batches, 10L)
    assert(BatchCommitLog.readCommitted(spark, data, batches, Ddl)
      .count() == 11)
    assert(BatchCommitLog.isCommitted(spark, batches, 10L))
    // compacting twice is a no-op shape, not an error
    BatchCommitLog.compact(spark, batches)
    assert(BatchCommitLog.committed(spark, batches).count() == 11)
  }
}
