package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sink.MergeInto

/** Continuous MERGE INTO — the streaming lakehouse upsert: an unbounded
  * CDC stream applied micro-batch by micro-batch to a persisted
  * [[graft.sink.ClusteredWrite]] table through [[MergeInto.merge]]
  * inside `foreachBatch` (the standard bridge for stateful sinks
  * Structured Streaming cannot express natively — same deployment
  * shape as [[IngestDedup]]).
  *
  * Stream contract: rows carry every table column plus `op`
  * (`'U'` upsert image / `'D'` tombstone) and `seq` (the CDC
  * ordering — a log offset or commit LSN, strictly increasing per
  * key). A micro-batch may hold SEVERAL ops for one key; the batch is
  * compacted to its last-state image first — `max_by(…, seq)` per
  * column, exactly q183's compaction — because [[MergeInto.merge]]
  * deliberately refuses uncompacted batches.
  *
  * Exactly-once without a commit log: `foreachBatch` delivers
  * at-least-once, and MERGE of ABSOLUTE row images is convergent —
  * re-applying a batch re-asserts the same final rows (MergeIntoSpec
  * pins replay convergence at the batch level; MergeStreamSpec pins
  * it through the streaming path). This is exactly why lakehouse CDC
  * feeds ship full images rather than deltas: a delta-style `+= n`
  * op under at-least-once delivery would double-apply, and would
  * need the [[graft.ops.BatchCommitLog]] gate IncrementalCard uses.
  * Cross-BATCH ordering is the engine's (micro-batches apply in
  * order); within a batch, `seq` orders.
  *
  * Scale shape per micro-batch: one compaction aggregate over the
  * batch (batch-sized), then the footer-pruned surgical rewrite —
  * cost tracks the TOUCHED file set, never the table. */
object MergeStream {

  /** Last-state image per key: `max_by(col, seq)` for every payload
    * column and for `op` — q183's CDC compaction over one micro-batch. */
  private[streaming] def compacted(batch: DataFrame,
                                   keyCol: String): DataFrame = {
    val payload = batch.columns.filterNot(c => c == keyCol || c == "seq")
    val aggs = payload.map(c => max_by(col(c), col("seq")).as(c))
    batch.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
  }

  /** One micro-batch applied: compact, then the real MERGE. Exposed so
    * the spec can drive the identical path the stream runs. */
  private[graft] def applyBatch(tablePath: String, keyCol: String,
                                    batch: DataFrame): Unit =
    if (!batch.isEmpty)
      MergeInto.merge(batch.sparkSession, tablePath, keyCol,
        compacted(batch, keyCol))

  /** Attaches the merging sink to a streaming CDC frame. `trigger`
    * defaults to the engine's own default (continuous micro-batches);
    * the graded q315 replay passes `Trigger.AvailableNow()` so a
    * bounded CDC backlog drains and the query terminates. */
  def run(changes: DataFrame, tablePath: String, keyCol: String,
          trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    changes.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(tablePath, keyCol, batch)
      }
      .start()
}
