package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the q166 dataset data card — the
  * materialized-view pattern a 100 TB corpus needs: the datasheet must
  * stay current as ingest batches land, and rescanning the whole
  * corpus per refresh (what q166 does as a one-shot query) stops being
  * an option. Instead each appended batch writes its PARTIAL
  * aggregates once — per-(lang, source) counts/sums/maxes (mergeable
  * by plain addition/max, the SketchRollup argument applied to the
  * card) plus its NEW content digests (admitted through an anti-join
  * against the persisted digest table, the q107 band-index pattern
  * applied to exact-dedup mass) — and the card itself aggregates ONLY
  * the partials: batch-sized work per append, partials-sized work per
  * read, the raw corpus never rescanned.
  *
  * Replay safety: every append names its batch id; a batch already in
  * the recorded-batches table is a NO-OP (partials would double-count
  * on a blind re-append — the failure mode checkpoint-restart ingest
  * actually hits). The digest admission is idempotent by construction
  * (anti-join), but the partials need the gate.
  *
  * Library component (no DuckDB oracle — the point is the refresh
  * PROTOCOL, pinned by IncrementalCardSpec: card-equals-direct after
  * every append, replay no-op, and the card plan reading only the
  * state directory). */
object IncrementalCard {

  final case class State(root: String) {
    def partials: String = s"$root/partials"
    def digests: String = s"$root/digests"
    def batches: String = s"$root/batches"
  }

  def init(workdir: String): State = {
    val s = State(workdir)
    Files.createDirectories(Paths.get(workdir))
    s
  }

  private def exists(p: String): Boolean =
    Files.exists(Paths.get(p, "_SUCCESS"))

  /** Appends one ingest batch (`(lang, source, text)` rows at least)
    * to the maintained state. Returns false (no-op) when `batchId` was
    * already recorded. */
  def append(spark: SparkSession, st: State, batchId: Long,
             batch: DataFrame): Boolean = {
    if (exists(st.batches) &&
        spark.read.parquet(st.batches)
          .filter(col("batch_id") === batchId).limit(1).count() > 0)
      return false

    val prepared = batch.select(col("lang"), col("source"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")
          .as("ws"),
        graft.functions.Bpe.count(col("text")).as("btok"),
        md5(col("text")).as("digest"))
      .localCheckpoint(true) // partials + digest admission both read it

    prepared.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("ws").as("ws_tokens"),
        sum("btok").as("bpe_tokens"), max("btok").as("max_btok"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(st.partials)

    val newDigests = prepared.select("digest").distinct()
    val admitted =
      if (exists(st.digests))
        newDigests.join(spark.read.parquet(st.digests),
          Seq("digest"), "left_anti")
      else newDigests
    admitted.write.mode("append").parquet(st.digests)

    import spark.implicits._
    Seq(batchId).toDF("batch_id")
      .write.mode("append").parquet(st.batches)
    true
  }

  /** Streaming maintenance — the card stays current as an unbounded
    * ingest runs: every micro-batch appends through the same
    * replay-gated protocol, Structured Streaming's `foreachBatch`
    * batch id serving as the batch id, so a crash-replayed
    * micro-batch hits the recorded-batches gate and the card stays
    * EXACTLY-ONCE under restarts (the IngestDedup deployment shape
    * applied to view maintenance). */
  def maintain(st: State, batches: DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        append(b.sparkSession, st, id, b)
        ()
      }
      .start()

  /** The current data card — aggregates the persisted partials and the
    * digest table only; the ingested batches are never rescanned. */
  def card(spark: SparkSession, st: State): DataFrame = {
    val p = spark.read.parquet(st.partials)
    val nDistinct = spark.read.parquet(st.digests).count()
    p.agg(
      sum("n_docs").as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum("ws_tokens").as("ws_tokens"),
      sum("bpe_tokens").as("bpe_tokens"),
      (sum("n_docs") - lit(nDistinct)).as("n_exact_dups"),
      max("max_btok").as("max_doc_btok"))
  }
}
