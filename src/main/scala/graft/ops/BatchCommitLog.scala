package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared micro-batch COMMIT-LOG protocol behind the incremental
  * maintainers ([[IncrementalCard]], `graft.streaming.DriftMonitor`)
  * — extracted r11 after the two components carried line-for-line
  * copies and the r10 protocol holes (torn-write visibility,
  * checkpoint restart) had to be fixed once per copy.
  *
  * The protocol, in order, per batch:
  *
  *  1. every data table is PARTITIONED BY `batch_id` and written with
  *     dynamic partition OVERWRITE ([[writePartitioned]]) — a replayed
  *     batch replaces exactly its own partition, so a crash between
  *     the data writes and the commit record can never double rows;
  *  2. the batch id is recorded LAST ([[record]]) — the commit point;
  *  3. readers semi-join every data table against [[committed]]
  *     (or read through [[readCommitted]]) so rows from a batch that
  *     died mid-append are invisible until its replay commits.
  *
  * [[isCommitted]] is the replay gate: an append for an
  * already-recorded id must be a no-op. The protocol's behavior is
  * pinned by IncrementalCardSpec (torn write, replay convergence,
  * stream restart) and DriftMonitorSpec. */
object BatchCommitLog {

  private def exists(p: String): Boolean =
    Files.exists(Paths.get(p, "_SUCCESS"))

  /** The recorded-batches frame — empty (never errors) before the
    * first commit. */
  def committed(spark: SparkSession, batchesDir: String): DataFrame =
    if (exists(batchesDir)) spark.read.parquet(batchesDir)
    else {
      import spark.implicits._
      Seq.empty[Long].toDF("batch_id")
    }

  /** The replay gate. */
  def isCommitted(spark: SparkSession, batchesDir: String,
                  batchId: Long): Boolean =
    committed(spark, batchesDir)
      .filter(col("batch_id") === batchId).limit(1).count() > 0

  /** Idempotent per-batch data write: batch_id-partitioned dynamic
    * overwrite (protocol step 1). */
  def writePartitioned(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(dir)

  /** The commit point (protocol step 2) — call ONLY after every data
    * write of the batch has finished. */
  def record(spark: SparkSession, batchesDir: String,
             batchId: Long): Unit = {
    import spark.implicits._
    Seq(batchId).toDF("batch_id")
      .write.mode("append").parquet(batchesDir)
  }

  /** A data table restricted to COMMITTED batches (protocol step 3).
    * `schemaDdl` makes the read total: before the first append — or
    * when an append wrote only empty partitions — the path may be
    * missing or hold no parquet footers, and a reader polling at that
    * moment must see an empty frame, not PATH_NOT_FOUND (r11 review).
    * The DDL must include `batch_id BIGINT` (the partition column).
    * A caller reading SEVERAL data tables against the same commit log
    * should read [[committed]] once and pass it as `committedDf` —
    * otherwise every call re-lists the batches directory (r11 review:
    * drift() was listing it three times per poll). */
  def readCommitted(spark: SparkSession, dataDir: String,
                    batchesDir: String, schemaDdl: String,
                    committedDf: Option[DataFrame] = None): DataFrame = {
    val data =
      if (Files.exists(Paths.get(dataDir)))
        spark.read.schema(schemaDdl).parquet(dataDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
    data.join(broadcast(committedDf.getOrElse(committed(spark, batchesDir))),
      Seq("batch_id"), "left_semi")
  }

  /** Bounds the commit log for long-lived streams: [[record]] appends
    * one small parquet file per batch forever, so the log's file count
    * — and with it every poll's listing cost and the broadcast build —
    * grows without bound on an unbounded-ingest maintainer. Rewrites
    * the current id set as ONE parquet file appended into the same
    * directory, then deletes the pre-compaction files. Crash-safe at
    * every point in the sequence: the consolidated file lands via a
    * normal append BEFORE any delete, and a crash mid-delete merely
    * leaves duplicate ids, which every reader already tolerates
    * ([[committed]] is consumed as a set — semi-join membership and a
    * `limit(1)` existence probe). A concurrent [[record]] is likewise
    * safe: a file created after the pre-listing is never deleted.
    *
    * Concurrent READER contract (r12 review): a reader in ANOTHER
    * session whose scan planned its file listing just before the
    * delete can hit FileNotFoundException when the job executes —
    * durability is never at risk (the consolidated file holds every
    * id), but that one read fails and must be retried (its next
    * listing is consistent). So: run compaction from the maintainer
    * that owns the log, on its own cadence (e.g. every N batches,
    * ideally between polls); external dashboards polling the same log
    * should treat a missing-file failure as a retryable read, the
    * same contract as any file table compacted in place without a
    * transaction log. Reads in THIS session after compact() returns
    * are always consistent. */
  def compact(spark: SparkSession, batchesDir: String): Unit = {
    if (!exists(batchesDir)) return
    import scala.jdk.CollectionConverters._
    // Files.list holds a directory handle until closed (r12 advice:
    // the unclosed stream leaked one handle per compaction)
    val listing = Files.list(Paths.get(batchesDir))
    val pre =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toList
      finally listing.close()
    if (pre.size <= 1) return
    committed(spark, batchesDir).distinct()
      .coalesce(1).write.mode("append").parquet(batchesDir)
    pre.foreach(Files.deleteIfExists(_))
  }
}
