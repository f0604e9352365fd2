package graft.sink

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q220 (stats-manifest file pruning) beyond the DuckDB oracle (which
  * reads the RAW table — the hash match is the no-lost-rows proof):
  * the pruning MECHANICS — the manifest covers every file and every
  * row, the pruned read opens strictly fewer files than the directory
  * holds, the plan's scan carries only the pruned list, and pruning is
  * sound (every file it drops provably holds no qualifying row). */
class ManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val (data, man) = Manifest.ensureRangedOrders(spark, dir)

  test("the manifest is complete: one row per data file, row counts " +
    "sum to the table, min <= max per file") {
    val files = Compact.dataFiles(spark, data).map(_.toUri.toString).toSet
    val m = spark.read.parquet(man).collect()
    assert(m.map(_.getString(0)).toSet == files)
    assert(m.map(_.getLong(3)).sum ==
      graft.ops.T(spark, dir, "orders").count())
    m.foreach { r =>
      assert(!r.getAs[java.time.LocalDateTime](1)
        .isAfter(r.getAs[java.time.LocalDateTime](2)), r.getString(0))
    }
  }

  test("pruning is selective AND sound: the 1996 window opens a strict " +
    "subset of files, every dropped file has no qualifying row, and " +
    "the plan scans only the pruned list") {
    val pruned = Manifest.prunedFiles(spark, man, "1996-01-01", "1996-12-31")
    val total = Compact.dataFiles(spark, data).size
    assert(pruned.nonEmpty)
    assert(pruned.size <= total / 4,
      s"pruned ${pruned.size} of $total — predicate not selective")
    // soundness: rows in DROPPED files never satisfy the predicate
    val dropped = Compact.dataFiles(spark, data).map(_.toUri.toString)
      .filterNot(pruned.toSet)
    val leaked = spark.read.parquet(dropped: _*)
      .filter(org.apache.spark.sql.functions.col("o_orderdate")
        .between("1996-01-01", "1996-12-31"))
      .count()
    assert(leaked == 0L, s"$leaked qualifying rows in pruned-away files")
    // the query's scan reads exactly the pruned list
    val scans = Manifest.q220ManifestPrune(spark, dir)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
      .filter(_.relation.location.rootPaths.mkString.contains("graft-ranged-"))
    assert(scans.nonEmpty)
    assert(scans.head.relation.location.inputFiles.length == pruned.size)
  }
}
