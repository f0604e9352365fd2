package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q233: [[MergeInto]] graded end-to-end — the q231/q210 discipline
  * (drive the real write machinery, hash-compare a read of its OUTPUT
  * against a RAW-table recompute) applied to the lakehouse MERGE, the
  * r13 verdict's top missing write path.
  *
  * Fixture, built once per (JVM, dataset): orders (key, status, price)
  * [[ClusteredWrite]]-clustered into 16 range-disjoint files on
  * o_orderkey, then ONE compacted CDC batch merged in:
  *  - matched UPDATE: keys `% 5 = 0` (and not deleted) get
  *    `price + 10.0` — the q183 update image;
  *  - tombstone DELETE: keys `% 7 = 0` vanish;
  *  - not-matched INSERT: for every key `% 11 = 0`, a NEW row at
  *    `key + 10^12` (provably beyond any real orderkey) with
  *    `price + 0.5`.
  * All three arms are derived deterministically from the raw table, so
  * the DuckDB oracle can recompute the post-merge state from `orders`
  * alone — it never sees the clustered copy, the routing, or the
  * rewrite. The graded query aggregates the merged table per status
  * (count / cent-sum / min / max key); a hash match proves every arm
  * landed on exactly the right rows across every file the merge did
  * and did not touch. MergeIntoSpec separately pins the mechanics the
  * aggregate cannot see: footer-pruned touch set, byte-identical
  * untouched files, preserved range-disjointness, convergent replay,
  * crash heal.
  *
  * Scale: the change batch is bounded CDC (merge walks its footer-
  * pruned touch set, not the table); the graded read is an ordinary
  * partial+final aggregate; price arithmetic adds exact dyadic
  * constants (10.0, 0.5) so cent-rounding is engine-independent. */
object MergeQueries {

  private val InsertShift = 1000000000000L

  private def ensureMergedOrders(s: SparkSession, dir: String): String =
    ScratchExport.once(s"merge:$dir") {
      val out = ScratchExport.scratchDir("graft-merge-")
      val base = graft.ops.T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ClusteredWrite.parquet(base, out, 16, col("o_orderkey"))
      val updates = base
        .filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") + 10.0d).as("o_totalprice"), lit("U").as("op"))
      val deletes = base
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit("D").as("op"))
      val inserts = base
        .filter(col("o_orderkey") % 11 === 0)
        .select((col("o_orderkey") + InsertShift).as("o_orderkey"),
          col("o_orderstatus"),
          (col("o_totalprice") + 0.5d).as("o_totalprice"), lit("U").as("op"))
      MergeInto.merge(s, out, "o_orderkey",
        updates.unionByName(deletes).unionByName(inserts))
      out
    }

  def q233MergeUpsert(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureMergedOrders(s, dir))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q233_merge_upsert" -> q233MergeUpsert _,
  )

  val oracle: Map[String, String] = Map(
    // post-merge state recomputed from the RAW table: survivors keep
    // (or update) their image under the same arithmetic, tombstoned
    // keys drop, inserts re-derive at key + 10^12
    "q233_merge_upsert" ->
      s"""WITH survivors AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
        |              THEN o_totalprice + 10.0 ELSE o_totalprice END AS price
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |ins AS (
        |  SELECT o_orderkey + $InsertShift AS o_orderkey, o_orderstatus,
        |         o_totalprice + 0.5 AS price
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |m AS (SELECT * FROM survivors UNION ALL SELECT * FROM ins)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2,
        |       CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |       CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
