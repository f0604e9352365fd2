package graft.sink

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** q108: the driver-visible query over the z-ordered storage layout —
  * the read-back half of [[ZOrderWrite]]'s story, oracle-checked.
  *
  * `lineitem` is written once per (JVM, dataset) as 16 parquet files
  * clustered on the Morton code of (l_shipdate, l_partkey); the query
  * then reads it back under a band predicate on the SECOND dimension
  * and aggregates. Correctness: the DuckDB oracle runs the same SQL on
  * the RAW table, so a hash match proves the layout loses/duplicates
  * nothing. Efficiency: a secondary-dimension predicate over a
  * single-key-clustered layout touches every file; over the z-order it
  * touches only the files whose key-space hyper-rectangle intersects
  * the band (ZOrderQueriesSpec asserts files-contributing < files-
  * written through this exact query path — at 100 TB that skip is the
  * difference between a full corpus scan and reading ~F^(1/2) of F
  * files).
  */
object ZOrderQueries {

  /** dataset dir → z-ordered lineitem location (write-once per JVM). */
  private val written = TrieMap[String, String]()

  private val ZFiles = 16

  /** Writes `lineitem` z-ordered on (ship-date days, partkey), both
    * keys min-max scaled to 16 bits. The scaling is load-bearing:
    * [[ZOrderWrite.zvalue]] interleaves RAW bit positions, so a key
    * with a wider native range (days ~ 14 bits here) would dominate
    * the code's high bits and degrade the layout to single-key
    * clustering on that dimension — equal-width keys give every
    * clustered dimension equal pruning power at every scale factor.
    * The min/max pass is one scalar aggregate (4 values to the
    * driver), amortized over every query against the layout. */
  private[graft] def ensureZOrderedLineitem(s: SparkSession,
                                            dir: String): String =
    written.synchronized {
      written.getOrElseUpdate(dir, {
        val li = T(s, dir, "lineitem")
        val days = datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
          .cast("long")
        val Row(dLo: Long, dHi: Long, pLo: Long, pHi: Long) = li
          .agg(min(days), max(days),
            min(col("l_partkey")), max(col("l_partkey"))).head()
        def scale16(c: Column, lo: Long, hi: Long): Column =
          ((c - lit(lo)) * lit(65535L) / lit(math.max(1L, hi - lo)))
            .cast("long")
        val out = Files.createTempDirectory("graft-zorder-").toString
        ZOrderWrite.parquet(li, out, ZFiles,
          scale16(days, dLo, dHi), scale16(col("l_partkey"), pLo, pHi))
        out
      })
    }

  /** q108: band predicate on l_partkey — the dimension a date-clustered
    * layout can NOT prune — over the z-ordered copy, then a small
    * aggregate. Same rounding contract as q30 (half-up 4dp on double
    * sums matches DuckDB's round). */
  def q108ZOrderPrune(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureZOrderedLineitem(s, dir))
      .filter(col("l_partkey").between(10, 29))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          4).as("sum_disc"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_zorder_prune" -> q108ZOrderPrune _,
  )

  /** The oracle reads the RAW lineitem — equality proves the z-order
    * rewrite preserved the table exactly. */
  val oracle: Map[String, String] = Map(
    "q108_zorder_prune" ->
      """SELECT l_returnflag,
        |       count(*) AS cnt,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc
        |FROM lineitem
        |WHERE l_partkey BETWEEN 10 AND 29
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  )
}
