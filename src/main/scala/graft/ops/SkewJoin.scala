package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins.
  *
  * AQE's skew-join split handles moderate sort-merge skew at runtime,
  * but a pathologically hot key in a broadcast-ineligible join still
  * serializes on the tasks holding that key. Salting spreads each key
  * over `r` subkeys: every big-side row gets a deterministic salt in
  * [0, r) derived from its full row hash, and the (smaller) right side
  * is replicated once per salt value, so the join key becomes
  * (key, salt) and the hot key's rows land on r tasks instead of one.
  * Cost: r× replication of the right side — use for dimension-sized
  * right sides that still exceed the broadcast threshold.
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `key`, salted `r` ways.
    * Result equals `big.join(small, key)` exactly (duplicates included):
    * each big row matches the single replica carrying its salt. */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      r: Int): DataFrame = {
    require(r > 0)
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(r.toLong)))
    val replicated = small.withColumn("_salt",
      explode(expr(s"sequence(0L, ${r - 1}L)")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  // ---- the DECISION (r14) ----------------------------------------------
  // q180's SURVEY row has promised since r10 that "the salting fan-out
  // reads off the top bucket"; this is that read, as code — the
  // StatsDecision discipline (a graded statistics artifact consulted
  // driver-side picks a plan, never an answer) applied to the skew knob.

  /** Salting fan-out from the q180 skew histogram (`(bucket, n_keys,
    * n_rows, max_rows)`, ≤64 cells — driver-side by nature): the
    * hottest key's row count over the per-task budget, clamped to
    * [1, maxFanout]. 1 means "don't salt" — a uniform key column must
    * never pay the r× replication. */
  def fanoutFrom(hist: DataFrame, targetRowsPerTask: Long,
                 maxFanout: Int = 64): Int = {
    require(targetRowsPerTask > 0)
    val cell = hist.agg(max("max_rows")).collect()(0)
    // empty histogram (empty/fully-filtered table): no rows = no skew
    if (cell.isNullAt(0)) 1
    else {
      val r = (cell.getLong(0) + targetRowsPerTask - 1) / targetRowsPerTask
      math.max(1L, math.min(r, maxFanout.toLong)).toInt
    }
  }

  /** [[saltedInnerJoin]] when the histogram says the key is hot,
    * the PLAIN join when it does not — both compute the identical
    * multiset (SkewJoinSpec's equality plus the decision-flip pin). */
  def decidedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                       hist: DataFrame, targetRowsPerTask: Long,
                       maxFanout: Int = 64): DataFrame = {
    val r = fanoutFrom(hist, targetRowsPerTask, maxFanout)
    if (r > 1) saltedInnerJoin(big, small, key, r)
    else big.join(small, Seq(key))
  }
}
