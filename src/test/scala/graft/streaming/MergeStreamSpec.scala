package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sink.ClusteredWrite

/** The streaming MERGE sink: micro-batches of CDC images apply to the
  * clustered table in order, an intra-batch multi-op key compacts to
  * its last image, a delete-then-reinsert across batches lands on the
  * reinserted image, and a crash-replayed batch converges (the
  * absolute-image contract that makes at-least-once delivery safe). */
class MergeStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def freshTable(): String = {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-mergestream-").toString
    ClusteredWrite.parquet(
      (0L until 800L by 10L).map(k => (k, k)).toDF("k", "v"), out, 8,
      col("k"))
    out
  }

  private def snapshot(out: String): Set[(Long, Long)] =
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("CDC micro-batches merge in order; intra-batch ops compact to " +
    "the last image; replayed batches converge") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = freshTable()
    val before = snapshot(out)
    val in = MemoryStream[(Long, Long, String, Long)]
    val q = MergeStream.run(
      in.toDF().toDF("k", "v", "op", "seq"), out, "k")
    try {
      // batch 1: k=10 updated TWICE (seq 1 then 3 — compaction must
      // pick 101), k=15 inserted into the 10..20 gap
      in.addData((10L, 100L, "U", 1L), (15L, 15L, "U", 2L),
        (10L, 101L, "U", 3L))
      q.processAllAvailable()
      assert(snapshot(out) ==
        before - ((10L, 10L)) + ((10L, 101L)) + ((15L, 15L)))
      // batch 2: tombstone k=20
      in.addData((20L, 0L, "D", 4L))
      q.processAllAvailable()
      assert(!snapshot(out).exists(_._1 == 20L))
      // batch 3: k=20 re-inserted with a new image
      in.addData((20L, 222L, "U", 5L))
      q.processAllAvailable()
      val afterAll = snapshot(out)
      assert(afterAll == before - ((10L, 10L)) - ((20L, 20L)) +
        ((10L, 101L)) + ((15L, 15L)) + ((20L, 222L)))
      // crash-replay of the LAST batch through the identical code path:
      // absolute images converge (the documented at-least-once safety)
      MergeStream.applyBatch(out, "k",
        Seq((20L, 222L, "U", 5L)).toDF("k", "v", "op", "seq"))
      assert(snapshot(out) == afterAll, "replayed batch must be a no-op")
    } finally q.stop()
  }

  test("compaction picks per-column last images by seq, delete wins " +
    "when it is last, and the result is one row per key") {
    import spark.implicits._
    val b = Seq(
      (1L, 10L, "U", 1L), (1L, 11L, "U", 7L), (1L, 12L, "U", 3L),
      (2L, 20L, "U", 1L), (2L, 0L, "D", 2L)
    ).toDF("k", "v", "op", "seq")
    val got = MergeStream.compacted(b, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 11L, "U"), (2L, 0L, "D")))
  }
}
