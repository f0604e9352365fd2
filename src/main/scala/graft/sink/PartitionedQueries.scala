package graft.sink

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** q133: the driver-visible query over a HIVE-PARTITIONED layout — the
  * most common 100 TB storage shape (date-partitioned fact tables),
  * complementing q108 (z-order file skipping) and q110 (bucket pruning):
  * directory-level partition elimination happens at PLANNING time, before
  * any file is opened, so a month-range query against a years-deep table
  * never even lists the out-of-range directories' files.
  *
  * `orders` is written once per (JVM, dataset) as
  * `o_month=yyyy-MM/part-*.parquet`; the query filters a 3-month range on
  * the PARTITION column (visible as `PartitionFilters` in the scan, with
  * the data filters empty — nothing left to push) and aggregates.
  * Correctness: the DuckDB oracle derives the same month from the raw
  * table, so a hash match proves the partitioned rewrite preserved every
  * row and the pruning dropped none in range. PartitionPruneSpec pins the
  * efficiency half: `selectedPartitions` is exactly the in-range month
  * count, a strict subset of the directories written.
  */
object PartitionedQueries {

  /** dataset dir → month-partitioned orders location (write-once per
    * JVM, same protocol as ZOrderQueries). */
  private val written = TrieMap[String, String]()

  private[graft] def ensurePartitionedOrders(s: SparkSession,
                                             dir: String): String =
    written.synchronized {
      written.getOrElseUpdate(dir, {
        val out = Files.createTempDirectory("graft-hivepart-").toString
        T(s, dir, "orders")
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
          .write.partitionBy("o_month").mode("overwrite").parquet(out)
        out
      })
    }

  /** q133: month-range aggregate over the partitioned copy. The range
    * predicate binds to the DIRECTORY column; totals in exact integer
    * cents (2-decimal prices by generator contract). */
  def q133PartitionPrune(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensurePartitionedOrders(s, dir))
      // the directory column's type comes from partition-value
      // INFERENCE ("1997-03" → string today, but inference rules are a
      // session config away from drifting); the explicit cast pins the
      // comparisons to string semantics either way, and Catalyst still
      // prunes partitions through it (cast-of-attribute ≥ literal)
      .withColumn("o_month", col("o_month").cast("string"))
      .filter(col("o_month") >= "1997-03" && col("o_month") <= "1997-05")
      .groupBy("o_month", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_month", "o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_partition_prune" -> q133PartitionPrune _,
  )

  /** The oracle reads the RAW orders and derives the month — equality
    * proves the partitioned rewrite neither lost nor duplicated rows. */
  val oracle: Map[String, String] = Map(
    "q133_partition_prune" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1997-03' AND '1997-05'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
