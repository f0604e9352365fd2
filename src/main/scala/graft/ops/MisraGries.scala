package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
  * frequency-family sibling of the HLL rollups in [[SketchRollup]]:
  * a k-counter summary whose merge is counter addition followed by a
  * rank-(k+1) offset subtraction (Agarwal et al., "Mergeable
  * Summaries"), so partial aggregation composes exactly like any
  * map-side combine.
  *
  * Guarantee (what q163 builds on): every counter underestimates its
  * item's true count by at most N/(k+1), where N is the stream length
  * — so any item with true count > N/(k+1) is ALWAYS present in the
  * final summary, regardless of partitioning or merge order. The
  * summary itself is order-dependent (which light items linger varies)
  * — callers needing determinism must verify candidates exactly, as
  * q163 does.
  *
  * The buffer is an immutable Map capped at k entries (~k × word bytes
  * — constant per task); `finish` returns the sorted candidate words.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < k => b.updated(w, 1L)
      case None => // decrement-all: the classic MG eviction step
        b.flatMap { case (x, c) =>
          if (c > 1) Some(x -> (c - 1)) else None
        }
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val m = (a.keySet ++ b.keySet).iterator
      .map(x => x -> (a.getOrElse(x, 0L) + b.getOrElse(x, 0L))).toMap
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count from everything — the
      // mergeable-summaries offset that preserves the N/(k+1) bound
      val d = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (x, c) => if (c - d > 0) Some(x -> (c - d)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
