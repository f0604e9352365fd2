package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern that makes 100 TB ETL affordable: a stored per-key aggregate
  * is brought up to date by merging ONLY the new batch's partial
  * aggregate, never by re-reading the base facts. The complement to
  * q104's incremental DEDUP (which probes a persisted index): here the
  * persisted state is itself the aggregate, and "merge" is union +
  * re-aggregate — the partial/final split Spark already performs inside
  * one query, lifted across BATCH BOUNDARIES.
  *
  * The discipline that makes this correct is MERGEABILITY: count and
  * sum merge by summing; avg must be STORED as (sum, count) and divided
  * at read time; distinct counts must be stored as mergeable sketches
  * (q36/q115's HLL discipline) — a stored avg or exact-distinct column
  * is the classic unmergeable-MV bug. This op stores only counts and
  * integer-cent sums, both trivially mergeable.
  */
object MvRefresh {

  /** Batch split: a deterministic hash of the order key — batch 1
    * (~80%) plays the role of "all history already aggregated", batch 2
    * (~20%) is "today's load". */
  private[sink] def batchTag = pmod(xxhash64(col("o_orderkey")), lit(10L))

  private def monthAgg(df: DataFrame): DataFrame =
    df.withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))

  /** The stored MV: batch 1's monthly aggregate, written once per
    * (JVM, dataset) — months × 2 columns, compact regardless of fact
    * volume. */
  private[sink] def ensureBaseAgg(s: SparkSession, dir: String): String =
    ScratchExport.once(s"mv-base:$dir") {
      val out = ScratchExport.scratchDir("graft-mvbase-")
      monthAgg(T(s, dir, "orders").filter(batchTag < 8))
        .write.mode("overwrite").parquet(out)
      out
    }

  /** q203: refresh = stored MV ∪ delta's partial aggregate → final
    * re-aggregate. The plan reads the months-sized MV parquet and ONE
    * scan of the new batch — the base facts never re-aggregate
    * (MvRefreshSpec pins exactly one orders scan in the refresh plan);
    * at 100 TB the refresh cost is O(delta + months), while the full
    * recompute the DuckDB oracle runs is O(history). Equality of the
    * two is the mergeability proof. */
  def q203MvRefresh(s: SparkSession, dir: String): DataFrame = {
    val base = s.read.parquet(ensureBaseAgg(s, dir))
    val delta = monthAgg(T(s, dir, "orders").filter(batchTag >= 8))
    base.unionByName(delta)
      .groupBy("o_month")
      .agg(sum("n_orders").as("n_orders"),
        sum("sum_price_c2").as("sum_price_c2"))
      .orderBy("o_month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q203_mv_refresh" -> q203MvRefresh _,
  )

  /** The oracle is the FULL recompute over all history — equality
    * proves the merge lost and duplicated nothing. */
  val oracle: Map[String, String] = Map(
    "q203_mv_refresh" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
