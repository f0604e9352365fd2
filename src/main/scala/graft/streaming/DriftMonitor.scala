package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *
  * Crash/replay: the IncrementalCard r11 protocol — partials
  * partitioned by batch_id with dynamic-overwrite (a replayed batch
  * replaces exactly its own partition), the batch id recorded LAST,
  * and [[drift]] reading only COMMITTED partials, so a torn append is
  * invisible and replay converges. DriftMonitorSpec pins
  * drift-equals-q188 on the same snapshot split, zero drift on the
  * reference itself, and replay idempotence. */
object DriftMonitor {

  final case class State(root: String) {
    def reference: String = s"$root/reference"
    def partials: String = s"$root/partials"
    def batches: String = s"$root/batches"
    def checkpoint: String = s"$root/checkpoint"
  }

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

  private def exists(p: String): Boolean =
    Files.exists(Paths.get(p, "_SUCCESS"))

  private def committed(spark: SparkSession, st: State): DataFrame =
    if (exists(st.batches)) spark.read.parquet(st.batches)
    else {
      import spark.implicits._
      Seq.empty[Long].toDF("batch_id")
    }

  /** One micro-batch append — replay-gated and partition-idempotent
    * (the IncrementalCard r11 protocol). */
  def append(spark: SparkSession, st: State, batchId: Long,
             batch: DataFrame): Boolean = {
    if (committed(spark, st)
          .filter(col("batch_id") === batchId).limit(1).count() > 0)
      return false
    wordCounts(batch, "c")
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(st.partials)
    import spark.implicits._
    Seq(batchId).toDF("batch_id")
      .write.mode("append").parquet(st.batches)
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
    * state directory; the streamed batches are never rescanned. */
  def drift(spark: SparkSession, st: State): DataFrame = {
    val ok = broadcast(committed(spark, st))
    val seen = spark.read.parquet(st.partials)
      .join(ok, Seq("batch_id"), "left_semi")
      .groupBy("word").agg(sum("c").as("c"))
    val joined = spark.read.parquet(st.reference)
      .join(seen, Seq("word"), "full_outer")
      .select(coalesce(col("cref"), lit(0L)).as("cref"),
        coalesce(col("c"), lit(0L)).as("c"))
    val totals = joined.agg(
      sum("cref").cast("decimal(38,0)").as("na"),
      sum("c").cast("decimal(38,0)").as("nb"))
    joined.crossJoin(broadcast(totals)) // 1-row totals (q188 class)
      .select(abs(col("cref").cast("decimal(38,0)") * col("nb")
        - col("c").cast("decimal(38,0)") * col("na")).as("d"),
        col("na"), col("nb"))
      .agg(sum("d").as("num"), max("na").as("na"), max("nb").as("nb"))
      .crossJoin(broadcast(ok.agg(count(lit(1)).as("n_batches"))))
      .select(
        expr("cast((2 * num * 10000 + 2 * (na * nb)) div (4 * (na * nb)) as long)")
          .as("tvd_bp"),
        col("na").cast("long").as("n_ref_tokens"),
        col("nb").cast("long").as("n_seen_tokens"),
        col("n_batches"))
  }
}
