package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** q210 (small-file compaction) beyond the DuckDB oracle (which only
  * proves the aggregate matches the raw table): the file-count
  * mechanics, byte-level row identity, the shuffle-free plan claim, and
  * sizing edge cases. */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("compaction collapses the 48-fragment fixture to the planned " +
    "byte-sized file count, and every row survives identically") {
    val frag = Compact.ensureFragmentedOrders(spark, dir)
    val comp = Compact.ensureCompactedOrders(spark, dir)
    val nFrag = Compact.dataFiles(spark, frag).size
    val nComp = Compact.dataFiles(spark, comp).size
    assert(nFrag == 48, s"fixture wrote $nFrag files")
    assert(nComp < nFrag && nComp >= 1, s"compacted to $nComp files")

    val a = spark.read.parquet(frag).orderBy("o_orderkey").collect().toSeq
    val b = spark.read.parquet(comp).orderBy("o_orderkey").collect().toSeq
    assert(a == b, "row content changed across compaction")
    assert(spark.read.parquet(comp).schema ==
      spark.read.parquet(frag).schema)
  }

  test("the compaction read plan is shuffle-free: coalesce merges " +
    "splits, nothing exchanges") {
    val frag = Compact.ensureFragmentedOrders(spark, dir)
    val plan = spark.read.parquet(frag).coalesce(3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"compaction plan shuffles:\n$plan")
    assert(plan.contains("Coalesce"), plan)
  }

  test("sizing: target larger than the table compacts to ONE file; " +
    "compaction is idempotent on an already-compact directory") {
    val frag = Compact.ensureFragmentedOrders(spark, dir)
    val one = ScratchExport.scratchDir("graft-compact-one-")
    val n = Compact.compact(spark, frag, one, Long.MaxValue)
    assert(n == 1 && Compact.dataFiles(spark, one).size == 1)
    val again = ScratchExport.scratchDir("graft-compact-again-")
    val n2 = Compact.compact(spark, one, again, Long.MaxValue)
    assert(n2 == 1)
    assert(spark.read.parquet(again).count() ==
      T(spark, dir, "orders").count())
    intercept[IllegalArgumentException] {
      Compact.compact(spark, frag, one, 0L)
    }
  }
}
