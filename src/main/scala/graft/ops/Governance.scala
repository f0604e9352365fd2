package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-governance operations — the compliance surface a warehouse (and
  * every training-data store holding user-derived rows) runs on demand:
  * right-to-be-forgotten delete propagation across the foreign-key
  * graph, with an auditable per-table account of what a deletion batch
  * touches BEFORE anything is rewritten.
  */
object Governance {

  /** The deterministic deletion cohort: ~6% of customers (1/16), selected by
    * the repo's md5-ticket discipline (`conv(md5, 16, 10) % 16 = 0` —
    * the same hex-prefix BIGINT both engines compute identically).
    * Stands in for the externally-supplied erasure list a real GDPR
    * batch carries. */
  private def delTicket(key: String): String =
    s"cast(conv(substring(md5(concat('del:', cast($key as string))), 1, 12), " +
      s"16, 10) as bigint) % 16 = 0"

  /** q216: cascade-delete audit — given the customer erasure cohort,
    * propagate it through the FK graph (customer → orders → lineitem;
    * customer → events) and report, per table, how many rows the
    * deletion batch removes and how many survive: `(tbl, n_rows,
    * n_deleted, n_kept)`, one row per table. This is the dry-run every
    * delete pipeline executes first — the counts are the audit record,
    * and the surviving-row predicate is exactly the anti-join a
    * subsequent rewrite applies.
    *
    * Scale shape: ONE audit scan per table plus exactly two derivation
    * passes — the cohort build (one customer scan, localCheckpointed so
    * the three consumers read the materialized key set instead of
    * re-scanning customer each) and the deleted-order key derivation
    * (one orders scan) — six scans total, q207's one-sweep-per-table
    * discipline. The key sets stay distributed end-to-end: customer
    * keys are erasure-cohort-sized (~6%), the derived deleted-ORDER key
    * set is produced by a semi-join and never touches the driver; joins
    * are plain equi-joins Spark sizes itself (broadcast at this SF,
    * shuffle-hash at 10⁹-customer scale — nothing is force-broadcast
    * precisely because an erasure cohort over 100 TB customers is NOT
    * driver-bounded). Output is 4 rows. */
  def q216CascadeDelete(s: SparkSession, dir: String): DataFrame = {
    def cnt(df: DataFrame, tbl: String, deleted: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(deleted, 1L).otherwise(0L)), lit(0L))
            .as("n_deleted"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("n_deleted"),
          (col("n_rows") - col("n_deleted")).as("n_kept"))

    val cust = T(s, dir, "customer")
    val custDel = expr(delTicket("c_custkey"))
    val delKeys = cust.filter(custDel).select(col("c_custkey").as("k"))
      .localCheckpoint(true) // 3 consumers — build the cohort ONCE

    val orders = T(s, dir, "orders").select("o_orderkey", "o_custkey")
    val ordJoined = orders.join(delKeys, col("o_custkey") === col("k"), "left")
    val ordDelKeys = orders
      .join(delKeys, col("o_custkey") === col("k"), "left_semi")
      .select(col("o_orderkey").as("ok"))

    Seq(
      cnt(cust, "customer", custDel),
      cnt(ordJoined, "orders", col("k").isNotNull),
      cnt(T(s, dir, "lineitem").select("l_orderkey")
          .join(ordDelKeys, col("l_orderkey") === col("ok"), "left"),
        "lineitem", col("ok").isNotNull),
      cnt(T.events(s, dir).select("user_id")
          .join(delKeys, col("user_id") === col("k"), "left"),
        "events", col("k").isNotNull))
      .reduce(_ unionByName _)
      .orderBy("tbl")
  }

  private[ops] val KAnon = 5L        // the k in k-anonymity
  private[ops] val BandC2 = 100000L  // $1000 balance bands (cents)

  /** q237: k-anonymity audit — the re-identification-risk gauge that
    * complements q111 (PII scrub) and q216 (erasure propagation): under
    * the quasi-identifier tuple (nation, market segment, $1000 balance
    * band), how many equivalence classes does the customer table
    * partition into, how many violate k = [[KAnon]] (fewer than k
    * indistinguishable members), and how many rows those violating
    * classes expose? A release gate reads `rows_at_risk` the way q224
    * reads its checks: 0 means every customer hides in a crowd of ≥ k.
    *
    * Semantics: balances ride integer cents (the q183 `round(×100)`
    * cast) and the band divides `bal_c2 + 10⁶` — the offset keeps the
    * dividend positive for every in-contract balance (≥ −$10,000), so
    * Spark's `div` and DuckDB's `//` cannot diverge on negative
    * truncation (the T.tus ≥ 0 argument applied to money).
    *
    * Scale shape: groupBy(QI) count → groupBy(segment) rollup — two
    * partial+final aggregates, no window, no driver materialization;
    * the first shuffle is class-count-sized, the second
    * segment-count-sized. Output: one row per market segment
    * `(c_mktsegment, n_classes, n_violating, rows_at_risk, n_rows)`. */
  def q237KAnonymity(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        expr(s"(cast(round(c_acctbal * 100) as bigint) + 1000000) div $BandC2")
          .as("bal_band"))
      .groupBy("c_mktsegment", "c_nationkey", "bal_band")
      .agg(count(lit(1)).as("n"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < KAnon, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("n") < KAnon, col("n")).otherwise(0L))
          .as("rows_at_risk"),
        sum("n").as("n_rows"))
      .orderBy("c_mktsegment")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q216_cascade_delete" -> q216CascadeDelete _,
    "q237_k_anonymity" -> q237KAnonymity _,
  )

  val oracle: Map[String, String] = Map(
    // q216: the same md5-ticket cohort and FK propagation; counts are
    // plain integer aggregates in both engines
    "q216_cascade_delete" ->
      """WITH del AS (
        |  SELECT c_custkey AS k FROM customer
        |  WHERE ('0x' || substr(md5('del:' || c_custkey::VARCHAR), 1, 12))::BIGINT % 16 = 0),
        |odel AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT k FROM del)),
        |rows AS (
        |  SELECT 'customer' AS tbl, count(*) AS n_rows,
        |    sum(CASE WHEN c_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS n_deleted
        |  FROM customer
        |  UNION ALL SELECT 'orders', count(*),
        |    sum(CASE WHEN o_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END)
        |  FROM orders
        |  UNION ALL SELECT 'lineitem', count(*),
        |    sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM odel) THEN 1 ELSE 0 END)
        |  FROM lineitem
        |  UNION ALL SELECT 'events', count(*),
        |    sum(CASE WHEN user_id IN (SELECT k FROM del) THEN 1 ELSE 0 END)
        |  FROM events)
        |SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_deleted AS BIGINT) AS n_deleted,
        |       CAST(n_rows - n_deleted AS BIGINT) AS n_kept
        |FROM rows ORDER BY tbl""".stripMargin,
    // q237: identical QI tuple (offset-positive band division) and the
    // same two-level rollup; all counts are plain integer aggregates
    "q237_k_anonymity" ->
      s"""WITH cls AS (
        |  SELECT c_mktsegment, c_nationkey,
        |         (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // $BandC2 AS bal_band,
        |         count(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_classes,
        |       CAST(sum(CASE WHEN n < $KAnon THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |       CAST(sum(CASE WHEN n < $KAnon THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |       CAST(sum(n) AS BIGINT) AS n_rows
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
