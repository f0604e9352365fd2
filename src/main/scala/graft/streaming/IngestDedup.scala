package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Curation, TrainingData}

/** Streaming incremental ingest dedup — q104/q107's deployment shape on
  * an unbounded document stream: every micro-batch is MinHash-banded
  * (the shared q72 hash family — collisions against the index are only
  * meaningful because both sides band with the same code), screened
  * against the PERSISTED bucketed LSH band index (q107's exchange-free
  * probe), and the batch's clean docs are ADMITTED — their bands
  * appended into the bucket layout — so batch N+1 probes an index that
  * already contains batch N's survivors. The corpus text is never
  * rescanned; per-batch cost is |batch| × collision rate plus the
  * one-file-per-bucket append.
  *
  * Runs through `foreachBatch`, the standard bridge for stateful sinks
  * Structured Streaming can't express natively (the admission append is
  * a bucketed catalog-table write). Inside the callback the batch is a
  * plain DataFrame, so the whole q107 machinery applies unchanged.
  * Exactly-once caveat (documented, inherent to foreachBatch): a batch
  * replayed after a crash between append and commit re-appends its
  * clean docs' bands, but the REPORT is replay-stable — the probe
  * excludes self-collisions (a doc never flags against its own
  * previously-admitted bands) and `countDistinct` dedups duplicate band
  * rows — so replays cost index space, never screening correctness
  * (IngestDedupSpec pins the replayed report equal to the original).
  *
  * The admission policy here is admit-if-no-collision; a deployment
  * swaps `screened.count == 0` routing for its own review queue without
  * touching the banding or the index.
  */
object IngestDedup {

  /** Screens one batch of `(doc_id, text)` docs against `idxTable` and
    * admits the non-flagged docs' bands. Returns the screening report
    * `(doc_id, n_dups, first_dup)` — the flagged docs (collision
    * against the index); everything else was admitted. Batch-local
    * duplicates are NOT flagged (same contract as q104: the batch joins
    * the index, not itself — run the batch through q72 first if
    * intra-batch dedup is needed). */
  def ingestBatch(s: SparkSession, idxTable: String,
                  docs: DataFrame): DataFrame = {
    // checkpoint: the screen and the admission anti-join both consume
    // the bands; without it the shingle/minhash stack runs twice, and —
    // worse — the admission would race the screen's view of the index
    val bands = TrainingData.minhashBandsOf(TrainingData.shingleRowsOf(docs))
      .localCheckpoint(true)
    val report = Curation.screenAgainstIndex(s, idxTable, bands)
      .localCheckpoint(true) // stable snapshot BEFORE the index mutates
    val admitted = bands.join(report.select("doc_id"), Seq("doc_id"),
      "left_anti")
    Curation.admitToBandIndex(s, idxTable, admitted)
    report
  }

  /** Starts the streaming ingest: each micro-batch flows through
    * [[ingestBatch]]; `onReport` receives the per-batch screening
    * report (collected driver-side — sized by the batch's FLAGGED docs,
    * not the batch) with the batch id. */
  def start(docs: DataFrame, idxTable: String,
            onReport: (Array[org.apache.spark.sql.Row], Long) => Unit)
      : StreamingQuery =
    docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onReport(ingestBatch(batch.sparkSession, idxTable, batch).collect(),
          id)
      }
      .start()
}
