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

  /** q201: DYNAMIC partition pruning — the runtime counterpart of q133
    * (and the partition-axis sibling of q198's bloom filter): the
    * month set to keep is not a literal in the query, it is the OUTPUT
    * of a dimension-side filter (months in which any Q1-1997 shipment
    * was returned), so planning-time directory elimination is
    * impossible. Spark's DPP closes the gap: the broadcast dim's key
    * set becomes a `dynamicpruningexpression` on the fact scan's
    * PARTITION column, so out-of-set month directories are dropped at
    * runtime before their files are listed — the fact side reads
    * selected/total partitions exactly as if the months had been
    * literals (DppSpec pins the plan marker and the parity).
    *
    * This is THE 100 TB star-schema shape: a years-deep
    * date-partitioned fact joined to a filtered dimension on the
    * partition key. The aggregate is exact integer cents. */
  def q201DppJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = s.read.parquet(ensurePartitionedOrders(s, dir))
      .withColumn("o_month", col("o_month").cast("string"))
    val dim = T(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= expr("timestamp'1997-01-01'") &&
        col("l_shipdate") < expr("timestamp'1997-04-01'"))
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("m"))
      .distinct()
    fact.join(broadcast(dim), col("o_month") === col("m"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_partition_prune" -> q133PartitionPrune _,
    "q201_dpp_join" -> q201DppJoin _,
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
    // the oracle reads the RAW tables — equality proves the runtime
    // pruning dropped exactly the out-of-set months and nothing else
    "q201_dpp_join" ->
      """WITH m AS (SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS m
        |           FROM lineitem
        |           WHERE l_returnflag = 'R'
        |             AND l_shipdate >= TIMESTAMP '1997-01-01'
        |             AND l_shipdate < TIMESTAMP '1997-04-01')
        |SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2
        |FROM orders JOIN m ON strftime(o_orderdate, '%Y-%m') = m.m
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
