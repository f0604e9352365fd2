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
  * against the committed digest table, the q107 band-index pattern
  * applied to exact-dedup mass) — and the card itself aggregates ONLY
  * the partials: batch-sized work per append, partials-sized work per
  * read, the raw corpus never rescanned.
  *
  * Crash/replay discipline — the [[BatchCommitLog]] protocol
  * (extracted r11; DriftMonitor shares it), adopted after ADVICE r10
  * found two holes in the original "record the batch id last" form:
  *
  *  1. Partial and digest rows are PARTITIONED BY batch_id and written
  *     with dynamic partition OVERWRITE — a replayed batch replaces
  *     exactly its own partition, so a crash between the data writes
  *     and the batch-id record can never double rows (append mode
  *     would have duplicated the partials on replay).
  *  2. The batch id is recorded LAST, and [[card]] semi-joins both
  *     partials and digests against the recorded-batches table — rows
  *     from a batch that died mid-append are invisible until its
  *     replay commits, so the card never reads a torn write.
  *  3. Digest admission anti-joins against COMMITTED digests only, and
  *     the card counts `countDistinct(digest)`: if batch X crashed
  *     uncommitted and batch Y (sharing a digest) committed first,
  *     X's replay re-admits the digest — both copies are committed,
  *     and the distinct count (not the row count) keeps the dedup
  *     mass exact.
  *
  * Verified twice over: IncrementalCardSpec pins the refresh PROTOCOL
  * (card-equals-direct after every append, replay no-op, torn-write
  * invisibility, crash-replay convergence, the card plan reading only
  * the state directory), and — r13 — the graded `q228_incremental_card`
  * (Corpus.scala) drives the real append path end-to-end and
  * hash-compares [[card]] against a DuckDB recompute from the raw
  * corpus (q166's oracle SQL, shared verbatim). */
object IncrementalCard {

  final case class State(root: String) {
    def partials: String = s"$root/partials"
    def digests: String = s"$root/digests"
    def batches: String = s"$root/batches"
    def checkpoint: String = s"$root/checkpoint"
  }

  def init(workdir: String): State = {
    val s = State(workdir)
    Files.createDirectories(Paths.get(workdir))
    s
  }

  private val PartialsDdl =
    "lang STRING, source STRING, n_docs BIGINT, ws_tokens BIGINT, " +
      "bpe_tokens BIGINT, max_btok BIGINT, batch_id BIGINT"
  private val DigestsDdl = "digest STRING, batch_id BIGINT"

  /** Appends one ingest batch (`(lang, source, text)` rows at least)
    * to the maintained state. Returns false (no-op) when `batchId` was
    * already recorded. Idempotent under replay of a crashed append:
    * the batch_id-partitioned dynamic overwrite replaces any torn
    * partition from the failed attempt. */
  def append(spark: SparkSession, st: State, batchId: Long,
             batch: DataFrame): Boolean = {
    // one commit-log listing per append: the replay gate and the digest
    // admission share it (the BatchCommitLog multi-read discipline)
    val ok = BatchCommitLog.committed(spark, st.batches)
    if (ok.filter(col("batch_id") === batchId).limit(1).count() > 0)
      return false

    val prepared = batch.select(col("lang"), col("source"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")
          .as("ws"),
        graft.functions.Bpe.count(col("text")).as("btok"),
        md5(col("text")).as("digest"))
      .localCheckpoint(true) // partials + digest admission both read it

    BatchCommitLog.writePartitioned(
      prepared.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("ws").as("ws_tokens"),
          sum("btok").as("bpe_tokens"), max("btok").as("max_btok")),
      batchId, st.partials)

    // COMMITTED digests only: an uncommitted batch's digests must not
    // suppress admission (they may never commit)
    val admitted = prepared.select("digest").distinct()
      .join(BatchCommitLog.readCommitted(spark, st.digests, st.batches,
          DigestsDdl, Some(ok)).select("digest"),
        Seq("digest"), "left_anti")
    BatchCommitLog.writePartitioned(admitted, batchId, st.digests)

    // the commit point — everything above is invisible to card()
    // until this row lands, and re-runnable
    BatchCommitLog.record(spark, st.batches, batchId)
    true
  }

  /** Streaming maintenance — the card stays current as an unbounded
    * ingest runs: every micro-batch appends through the same
    * replay-gated protocol, Structured Streaming's `foreachBatch`
    * batch id serving as the batch id, so a crash-replayed
    * micro-batch hits the recorded-batches gate and the card stays
    * EXACTLY-ONCE under restarts (the IngestDedup deployment shape
    * applied to view maintenance). The checkpoint lives in the state
    * dir by default (r11 — ADVICE r10: without a durable
    * checkpointLocation a restarted query restarts batch ids at 0, and
    * the replay gate would silently DROP every new micro-batch). */
  def maintain(st: State, batches: DataFrame,
               checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(st.checkpoint))
      .foreachBatch { (b: DataFrame, id: Long) =>
        append(b.sparkSession, st, id, b)
        ()
      }
      .start()

  /** The current data card — aggregates the persisted partials and the
    * digest table only (each semi-joined to the COMMITTED batch ids,
    * so a torn append is invisible); the ingested batches are never
    * rescanned. */
  def card(spark: SparkSession, st: State): DataFrame = {
    val ok = BatchCommitLog.committed(spark, st.batches) // listed once
    val p = BatchCommitLog.readCommitted(spark, st.partials, st.batches,
      PartialsDdl, Some(ok))
    val nDistinct = BatchCommitLog.readCommitted(spark, st.digests,
        st.batches, DigestsDdl, Some(ok))
      .agg(countDistinct(col("digest"))).head.getLong(0)
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
