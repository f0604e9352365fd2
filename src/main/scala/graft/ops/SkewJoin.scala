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
}
