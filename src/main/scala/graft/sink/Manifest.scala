package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** File-statistics manifest pruning — the Iceberg/Delta data-skipping
  * story reduced to its primitive: a METADATA TABLE of per-file
  * (min, max) column statistics, consulted at plan time so a selective
  * query opens only the files whose stat range overlaps its predicate.
  * The layout family's missing rung: q133 prunes on the partition
  * VALUE (coarse, directory-level), q108/q110 prune row groups INSIDE
  * files via parquet footers — the manifest prunes whole FILES without
  * touching any footer, which at 100 TB is the difference between one
  * small metadata-table read and a million footer round trips.
  */
object Manifest {

  /** The range-clustered fixture: orders written as 48 files
    * range-partitioned + sorted on o_orderdate, so each file covers a
    * narrow date band (what a date-ordered ingest or a clustering
    * OPTIMIZE leaves behind — the layout that MAKES stats skipping
    * effective; on q210's randomly-fragmented layout every file spans
    * the full range and no manifest can prune it). Built once per
    * (JVM, dataset) with its manifest: one extra scan groups rows by
    * `input_file_name()` into per-file (min, max, rows) — file-count-
    * sized output. */
  private[graft] def ensureRangedOrders(s: SparkSession,
                                        dir: String): (String, String) =
    ScratchExport.once(s"manifest:$dir") {
      val data = ScratchExport.scratchDir("graft-ranged-")
      T(s, dir, "orders")
        .repartitionByRange(48, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(data)
      val man = ScratchExport.scratchDir("graft-manifest-")
      s.read.parquet(data)
        .groupBy(input_file_name().as("file"))
        .agg(min("o_orderdate").as("min_date"),
          max("o_orderdate").as("max_date"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(man)
      (data, man)
    }

  /** Files whose [min, max] band overlaps [lo, hi] — the planning read.
    * Driver-side by design: a manifest is FILE-COUNT-sized (one row per
    * data file — q186's bounded-collect class; at 100 TB with 1 GB
    * files that is ~10⁵ rows, metadata scale), and the file list must
    * reach the driver anyway to become the read's input split list. */
  private[graft] def prunedFiles(s: SparkSession, man: String,
                                 lo: String, hi: String): Seq[String] =
    s.read.parquet(man)
      .filter(col("max_date") >= lit(lo) && col("min_date") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq

  /** q220: selective monthly aggregate through the manifest — the scan
    * receives ONLY the overlapping files (ManifestSpec pins ≤¼ of the
    * 48 at this predicate), then applies the predicate exactly as
    * usual (stats prune files; they never replace the row filter —
    * boundary files carry out-of-range rows). The oracle reads the RAW
    * table: a hash match proves pruning lost no qualifying row, the
    * q210 round-trip discipline pointed at data skipping. Money in
    * exact integer cents. */
  def q220ManifestPrune(s: SparkSession, dir: String): DataFrame = {
    val (_, man) = ensureRangedOrders(s, dir)
    val (lo, hi) = ("1996-01-01", "1996-12-31")
    val files = prunedFiles(s, man, lo, hi)
    s.read.parquet(files: _*)
      .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") <= lit(hi))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q220_manifest_prune" -> q220ManifestPrune _,
  )

  val oracle: Map[String, String] = Map(
    "q220_manifest_prune" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2
        |FROM orders
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate <= '1996-12-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
