package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
  * anti-joins the WHOLE batch's doc ids off the index side, so a doc
  * never flags against its own (or an intra-batch near-duplicate
  * batchmate's) previously-admitted bands — so replays cost index
  * space, never screening correctness (IngestDedupSpec pins replayed
  * reports equal to the originals, including for a batch carrying its
  * own near-dup pair).
  *
  * The admission policy here is admit-if-no-collision; a deployment
  * swaps `screened.count == 0` routing for its own review queue without
  * touching the banding or the index.
  *
  * **doc_id contract: immutable and unique across the stream's
  * lifetime** (the usual ingest contract — ids come from an upstream
  * keyed store or a content digest). The replay-stability exclusion
  * above works BY doc_id: re-ingesting an id the index already holds is
  * treated as a replay of that doc, so its bands are excluded from its
  * own probe and the doc is never flagged — correct for a true replay
  * (same text), silent under-screening if an id is REUSED for different
  * text (the new text skips comparison against exactly one corpus doc:
  * the old text under its id; collisions against every other indexed
  * doc still flag normally). A deployment that cannot guarantee unique
  * ids should derive `doc_id` from a content hash (q70's sha2 digest)
  * upstream, which makes id-reuse-with-different-text impossible by
  * construction. IngestDedupSpec pins both sides of this contract.
  */
object IngestDedup {

  /** Screens one batch of `(doc_id, text)` docs against `idxTable` and
    * admits the non-flagged docs' bands. Returns the screening report
    * `(doc_id, n_dups, first_dup)` — the flagged docs; everything else
    * was admitted.
    *
    * `intraBatch = false` (default): only collisions against the INDEX
    * flag — batch-local duplicates pass unflagged (q104's contract: the
    * batch joins the index, not itself). `intraBatch = true` composes
    * the q72 pair shape over the batch's own bands: a doc also flags
    * against any SMALLER-doc_id batchmate sharing a band, so the first
    * of an intra-batch dup group survives and the rest are flagged
    * (keep-first, deterministic across replays). Cost is bounded by the
    * batch's band self-join — |batch|-squared only per colliding
    * bucket, the same banding bound as q72. Either way the report is
    * replay-stable: the index probe excludes the batch's own ids, and
    * the intra pairs are a pure function of the batch. */
  def ingestBatch(s: SparkSession, idxTable: String, docs: DataFrame,
                  intraBatch: Boolean = false): DataFrame = {
    // checkpoint: the screen and the admission anti-join both consume
    // the bands; without it the shingle/minhash stack runs twice, and —
    // worse — the admission would race the screen's view of the index
    val bands = TrainingData.minhashBandsOfDocs(docs)
      .localCheckpoint(true)
    val idxPairs = Curation.indexCollisionPairs(s, idxTable, bands,
      excludeDocs = Some(bands.select("doc_id")))
    val pairs =
      if (!intraBatch) idxPairs
      else idxPairs.union(
        bands.join(
            bands.select(col("doc_id").as("o_doc"), col("band"),
              col("k1"), col("k2")),
            Seq("band", "k1", "k2"))
          .filter(col("o_doc") < col("doc_id")) // keep-first survivor
          .select(col("doc_id"), col("o_doc")))
    val report = Curation.aggScreenReport(pairs)
      .localCheckpoint(true) // stable snapshot BEFORE the index mutates
    val admitted = bands.join(report.select("doc_id"), Seq("doc_id"),
      "left_anti")
    Curation.admitToBandIndex(s, idxTable, admitted)
    report
  }

  /** Starts the streaming ingest: each micro-batch flows through
    * [[ingestBatch]]; `onReport` receives the per-batch screening
    * report (collected driver-side — sized by the batch's FLAGGED docs,
    * not the batch) with the batch id. `compactEvery = n` runs
    * [[Curation.compactBandIndex]] after every n-th batch — between
    * batches no admission can race the swap, so the stream repairs the
    * file-count growth its own appends cause (0 = never). */
  def start(docs: DataFrame, idxTable: String,
            onReport: (Array[org.apache.spark.sql.Row], Long) => Unit,
            intraBatch: Boolean = false,
            compactEvery: Int = 0,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        onReport(ingestBatch(s, idxTable, batch, intraBatch).collect(), id)
        if (compactEvery > 0 && (id + 1) % compactEvery == 0)
          Curation.compactBandIndex(s, idxTable)
      }
      .start()
}
