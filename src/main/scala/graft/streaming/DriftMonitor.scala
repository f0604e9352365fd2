package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.BatchCommitLog

/** Streaming token-distribution drift monitor — q188's exact-integer
  * TVD maintained continuously over an unbounded ingest: the
  * distribution-shift alarm a production corpus pipeline keeps on the
  * crawl firehose ("did the upstream mix change under us?").
  *
  * Shape: the REFERENCE snapshot's word counts are materialized once
  * at init; each micro-batch appends only its OWN vocabulary-sized
  * word-count partial (mergeable by plain addition — the
  * IncrementalCard partials argument applied to a distribution), and
  * [[drift]] merges partials, full-outer-joins the reference
  * vocabulary (a word seen by only one side still contributes its
  * whole mass), and computes TVD = Σ|cref·NB − c·NA| / (2·NA·NB) in
  * half-up basis points — the cross-multiplied form is exact integers
  * (decimal(38,0)), no logarithm, the q188 discipline verbatim, so
  * the monitor's number is bit-stable across engines and replays.
  * Degenerate snapshots are DEFINED, not NULL (r11 review): both
  * sides empty → 0 bp; exactly one side empty → 10 000 bp (total
  * drift) — a dashboard polling before the first batch lands reads a
  * number, never a crash or a null.
  *
  * Crash/replay: the shared [[BatchCommitLog]] protocol
  * (batch_id-partitioned dynamic-overwrite partials, batch id
  * recorded last, committed-only reads — one implementation, shared
  * with IncrementalCard, so a protocol fix can never land in one
  * maintainer and miss the other). Retention: on an unbounded stream
  * the commit log accretes one small file per batch, so a long-lived
  * deployment calls [[BatchCommitLog.compact]] on its own cadence
  * (e.g. every few hundred batches) to keep the listing/broadcast
  * bounded — crash-safe, see that method. DriftMonitorSpec pins
  * drift-equals-q188 on the same snapshot split, zero self-drift,
  * replay no-op, the pre-first-batch poll, and the foreachBatch
  * end-to-end path. */
object DriftMonitor {

  final case class State(root: String) {
    def reference: String = s"$root/reference"
    def partials: String = s"$root/partials"
    def batches: String = s"$root/batches"
    def checkpoint: String = s"$root/checkpoint"
  }

  private val PartialsDdl = "word STRING, c BIGINT, batch_id BIGINT"

  private def wordCounts(docs: DataFrame, countCol: String): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as(countCol))

  /** Materializes the reference distribution once. */
  def init(spark: SparkSession, workdir: String,
           reference: DataFrame): State = {
    val st = State(workdir)
    Files.createDirectories(Paths.get(workdir))
    wordCounts(reference, "cref").write.mode("overwrite")
      .parquet(st.reference)
    st
  }

  /** One micro-batch append — replay-gated and partition-idempotent
    * ([[BatchCommitLog]]). */
  def append(spark: SparkSession, st: State, batchId: Long,
             batch: DataFrame): Boolean = {
    if (BatchCommitLog.isCommitted(spark, st.batches, batchId))
      return false
    BatchCommitLog.writePartitioned(wordCounts(batch, "c"), batchId,
      st.partials)
    BatchCommitLog.record(spark, st.batches, batchId)
    true
  }

  /** Attach the monitor to an unbounded (… text …) stream. */
  def start(st: State, batches: DataFrame,
            checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(st.checkpoint))
      .foreachBatch { (b: DataFrame, id: Long) =>
        append(b.sparkSession, st, id, b)
        ()
      }
      .start()

  /** The current drift against the reference: one row —
    * (tvd_bp, n_ref_tokens, n_seen_tokens, n_batches). Reads only the
    * state directory; the streamed batches are never rescanned. Total
    * before the first commit: the seen side reads as empty, not
    * PATH_NOT_FOUND. */
  def drift(spark: SparkSession, st: State): DataFrame = {
    val ok = BatchCommitLog.committed(spark, st.batches) // listed once
    val seen = BatchCommitLog.readCommitted(spark, st.partials,
        st.batches, PartialsDdl, Some(ok))
      .groupBy("word").agg(sum("c").as("c"))
    // explicit schema: an all-empty-text reference writes no parquet
    // footers, and inference would fail where an empty frame is meant
    val joined = spark.read.schema("word STRING, cref BIGINT")
      .parquet(st.reference)
      .join(seen, Seq("word"), "full_outer")
      .select(coalesce(col("cref"), lit(0L)).as("cref"),
        coalesce(col("c"), lit(0L)).as("c"))
    val totals = joined.agg(
      coalesce(sum("cref"), lit(0L)).cast("decimal(38,0)").as("na"),
      coalesce(sum("c"), lit(0L)).cast("decimal(38,0)").as("nb"))
    val nBatches = ok.agg(count(lit(1)).as("n_batches"))
    joined.crossJoin(broadcast(totals)) // 1-row totals (q188 class)
      .select(abs(col("cref").cast("decimal(38,0)") * col("nb")
        - col("c").cast("decimal(38,0)") * col("na")).as("d"),
        col("na"), col("nb"))
      .agg(coalesce(sum("d"), lit(0L).cast("decimal(38,0)")).as("num"),
        coalesce(max("na"), lit(0L).cast("decimal(38,0)")).as("na"),
        coalesce(max("nb"), lit(0L).cast("decimal(38,0)")).as("nb"))
      .crossJoin(broadcast(nBatches))
      .select(
        // degenerate snapshots are defined: both empty → 0, one empty
        // → 10000 (total drift); otherwise the exact r4 half-up form
        expr("""cast(CASE
          |  WHEN na = 0 AND nb = 0 THEN 0
          |  WHEN na = 0 OR nb = 0 THEN 10000
          |  ELSE (2 * num * 10000 + 2 * (na * nb)) div (4 * (na * nb))
          |END as long)""".stripMargin).as("tvd_bp"),
        col("na").cast("long").as("n_ref_tokens"),
        col("nb").cast("long").as("n_seen_tokens"),
        col("n_batches"))
  }
}
