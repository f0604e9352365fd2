package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** Small-file compaction — the lakehouse `OPTIMIZE` maintenance op.
  * Streaming ingest and per-batch commits (q153 shards, q161 JSONL
  * landings, IncrementalCard partials) leave a table as thousands of
  * KB-sized files; every later scan then pays one task + one footer
  * read per file, and the 100 TB failure mode is a listing/scheduling
  * storm, not bytes. Compaction rewrites the directory into
  * ⌈total_bytes / target_file_bytes⌉ files.
  *
  * Design points (the parts a naive rewrite gets wrong):
  *  - NO shuffle: `coalesce(n)` merges read splits locally — rows move
  *    from many files into few within each task, nothing repartitions
  *    (CompactSpec pins the exchange-free plan). A `repartition(n)`
  *    here would shuffle the entire table to fix a metadata problem.
  *  - sizing from the FILE LISTING, not a count: the driver reads only
  *    (path, size) pairs — bounded by file count, never rows.
  *  - rewrite lands in a fresh directory; the swap to readers is a
  *    pointer flip (the BatchCommitLog.compact append-before-delete
  *    contract — readers of the OLD listing stay consistent, and a
  *    crash mid-rewrite leaves the source untouched).
  */
object Compact {

  /** Rewrites the parquet directory `src` into `dest` with
    * ⌈Σsize / targetBytes⌉ files, shuffle-free. Returns the planned
    * output file count. */
  def compact(s: SparkSession, src: String, dest: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val total = totalBytes(s, src)
    val nOut = math.max(1L, (total + targetBytes - 1L) / targetBytes).toInt
    s.read.parquet(src).coalesce(nOut)
      .write.mode("overwrite").parquet(dest)
    nOut
  }

  /** The ONE definition of "data file" (the `_SUCCESS`/CRC chaff
    * excluded) — spec, sizing, and fixture wiring all read through
    * [[dataFiles]] / [[totalBytes]]. */
  private def dataStatuses(s: SparkSession, dir: String) = {
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  def dataFiles(s: SparkSession, dir: String): Seq[Path] =
    dataStatuses(s, dir).map(_.getPath)

  /** Σ size of the data files — driver cost bounded by file count. */
  def totalBytes(s: SparkSession, dir: String): Long =
    dataStatuses(s, dir).map(_.getLen).sum

  /** The fragmented fixture: orders deliberately written as 48 tiny
    * files (what 48 ingest micro-batches leave behind), once per
    * (JVM, dataset). */
  private[graft] def ensureFragmentedOrders(s: SparkSession,
                                            dir: String): String =
    ScratchExport.once(s"frag:$dir") {
      val out = ScratchExport.scratchDir("graft-frag-")
      T(s, dir, "orders").repartition(48)
        .write.mode("overwrite").parquet(out)
      out
    }

  /** The compacted copy: sized so the fixture compacts to a handful of
    * files (sum of the 48 fragments / 4, floor-capped). */
  private[graft] def ensureCompactedOrders(s: SparkSession,
                                           dir: String): String =
    ScratchExport.once(s"compact:$dir") {
      val src = ensureFragmentedOrders(s, dir)
      val out = ScratchExport.scratchDir("graft-compact-")
      compact(s, src, out, math.max(1L, totalBytes(s, src) / 4L))
      out
    }

  /** q210: selective monthly-revenue aggregate over the COMPACTED
    * orders copy — the oracle reads the RAW parquet table, so a hash
    * match proves the fragment → compact round trip neither lost,
    * duplicated, nor altered a row (the q173/q189/q192 format-matrix
    * discipline applied to layout maintenance). Money in exact integer
    * cents. */
  def q210CompactScan(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureCompactedOrders(s, dir))
      .filter(col("o_orderstatus") =!= "F")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_month")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_compact_scan" -> q210CompactScan _,
  )

  val oracle: Map[String, String] = Map(
    "q210_compact_scan" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2
        |FROM orders
        |WHERE o_orderstatus <> 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
