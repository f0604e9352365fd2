package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ScalableRank, T}

/** Surrogate-key vault — the dimension-load primitive every Kimball
  * warehouse runs on every batch: natural keys get DENSE, STABLE
  * integer surrogate keys, assigned once and never reassigned (facts
  * reference the surrogate; a reassignment silently re-points history,
  * which is why "stable" is the contract, not a nicety). The vault IS
  * the state: a persisted (natural_key, sk) table; each incoming batch
  * anti-joins it, and only the genuinely NEW keys receive the next
  * dense block of ids.
  *
  * The scale discipline: monotonically-increasing id assignment is the
  * textbook single-task trap (`row_number()` over a global window), so
  * new-key ranking rides [[ScalableRank.withGlobalRowNumber]]'s
  * two-pass distributed rank, offset by the vault's current max (one
  * 1-row aggregate). The anti-join broadcasts the BATCH key set when
  * the batch is small (the common nightly case) and shuffles both
  * sides when it isn't — Spark's own sizing, nothing forced. At 100 TB
  * the vault is bucketed on the natural key so every nightly merge
  * reuses one exchange.
  *
  * Determinism: within one batch, ids are assigned in natural-key
  * order — so the whole two-batch fixture has ONE reference assignment
  * any engine can state (`row_number() OVER (ORDER BY is_batch2,
  * natural_key)`), which is exactly the q258 oracle.
  */
object SurrogateKeys {

  /** The deterministic batch split — md5-ticket (cross-engine, the
    * q89/q129 chain): ~80% "history", ~20% "tonight's load". */
  private[sink] val TicketSql =
    "cast(conv(substring(md5(concat('sk:', cast(c_custkey as string))), " +
      "1, 12), 16, 10) as bigint) % 10"

  /** Merges `batch` (a one-column natural-key frame) into the vault at
    * `vaultPath`, assigning the next dense ids to keys not yet present.
    * Returns the number of NEW assignments. Idempotent: re-merging a
    * seen batch assigns nothing. */
  private[sink] def merge(s: SparkSession, vaultPath: String,
                          batch: DataFrame): Long = {
    val key = batch.columns.head
    val vault = s.read.parquet(vaultPath)
    val newKeys = batch.distinct()
      .join(vault.select(col("nk")), col(key) === col("nk"), "left_anti")
    val offset = vault.agg(coalesce(max("sk"), lit(0L))).collect()(0).getLong(0)
    val assigned = ScalableRank
      .withGlobalRowNumber(newKeys, "_rn", col(key))
      .select(col(key).as("nk"), (col("_rn") + offset).as("sk"))
    val n = assigned.count()
    if (n > 0) {
      // the union must materialize BEFORE the overwrite destroys its
      // own input (the classic self-overwrite read-under-write)
      val merged = vault.unionByName(assigned).localCheckpoint(true)
      merged.write.mode("overwrite").parquet(vaultPath)
    }
    n
  }

  /** Built once per (JVM, dataset): the vault seeded from the ~80%
    * history batch, then tonight's ~20% merged in — two generations of
    * the exact nightly cycle. */
  private[sink] def ensureVault(s: SparkSession, dir: String): String =
    ScratchExport.once(s"skvault:$dir") {
      val out = ScratchExport.scratchDir("graft-skvault-")
      val cust = T(s, dir, "customer")
      import s.implicits._
      // seed an empty vault so batch 1 goes through the SAME merge path
      Seq.empty[(Long, Long)].toDF("nk", "sk")
        .write.mode("overwrite").parquet(out)
      merge(s, out, cust.filter(expr(s"$TicketSql < 8")).select("c_custkey"))
      merge(s, out, cust.filter(expr(s"$TicketSql >= 8")).select("c_custkey"))
      out
    }

  /** q258: the vault after both generations — the full (natural_key,
    * surrogate) mapping, hash-compared against the oracle's one-shot
    * reference assignment. Equality proves density (no gap or dup
    * anywhere), stability (batch-1 ids were not disturbed by the
    * merge — any reassignment would shift some id off the reference),
    * and determinism of the within-batch order. SurrogateKeySpec
    * additionally pins idempotent re-merge and the incremental claim
    * (merge 2 assigned exactly the batch-2 count). */
  def q258SurrogateKeys(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureVault(s, dir))
      .select(col("nk").as("c_custkey"), col("sk"))
      .orderBy("c_custkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q258_surrogate_keys" -> q258SurrogateKeys _,
  )

  val oracle: Map[String, String] = Map(
    // the one-shot reference assignment: history keys first (in key
    // order), tonight's keys after (in key order) — the vault's two
    // incremental merges must reproduce it exactly
    "q258_surrogate_keys" ->
      """SELECT c_custkey,
        |       CAST(row_number() OVER (
        |         ORDER BY (('0x' || substr(md5('sk:' || c_custkey::VARCHAR), 1, 12))::BIGINT % 10 >= 8),
        |                  c_custkey) AS BIGINT) AS sk
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
