package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the two runtime join-pruning mechanisms the 100 TB plan relies
  * on (SURVEY §4.4). Both are built-in Catalyst features — the value
  * here is the enforcement test proving the local config actually
  * triggers them, so a conf regression can't silently turn a pruned
  * scan back into a full one:
  *
  *  - dynamic partition pruning (DPP): a selective dim filter prunes
  *    PARTITIONS of the fact scan at runtime (partition granularity);
  *  - runtime bloom filters: the dim side's join keys are sketched into
  *    a bloom filter that pre-filters the fact ROWS before the shuffle
  *    (row granularity, catches what partitioning can't).
  *
  * Thresholds are production-scale by default (the bloom filter's
  * application side must look ≥ 10 GB), so the tests lower them — the
  * same knobs a real deployment tunes.
  *
  * (r12 rename, was RuntimeFilterSpec: that name now covers the
  * EXPLICIT q198 bloom — build/probe contract and scan-stage placement
  * — while the declared-query DPP surface is DppSpec. This suite keeps
  * the conf-regression guard on the BUILT-IN mechanisms.) */
class BuiltinRuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  import graft.SparkTestBase.withConf

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dynamic partition pruning: dim filter prunes fact partitions") {
    val dir = graft.sink.ScratchExport.scratchDir("dpp-")
    import spark.implicits._
    (0 until 20).flatMap(d => (0 until 500).map(i => (d, i.toLong)))
      .toDF("day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(s"$dir/fact")
    (0 until 20).map(d => (d, if (d == 3) "pick" else "skip"))
      .toDF("day", "tag")
      .write.mode("overwrite").parquet(s"$dir/dim")

    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // force the reuse-exchange-free path so the subquery broadcast is
      // clearly attributable to DPP in the plan
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"tag" === "pick")
      val q = fact.join(dim, "day").groupBy("day").agg(sum("v").as("s"))
      val plan = physicalPlan(q)
      assert(plan.contains("dynamicpruning"), s"no DPP in plan:\n$plan")
      val rows = q.collect()
      assert(rows.length == 1 && rows.head.getInt(0) == 3)
      assert(rows.head.getLong(1) == (0L until 500).sum)
    }
  }

  test("runtime bloom filter: dim keys row-filter the fact scan side") {
    val dir = graft.sink.ScratchExport.scratchDir("bloom-")
    import spark.implicits._
    (0 until 4096 * 50).map(i => (i.toLong % 4096, i.toLong))
      .toDF("k", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0 until 4096).map(i => (i.toLong, if (i % 64 == 0) "hot" else "cold"))
      .toDF("k", "attr")
      .write.mode("overwrite").parquet(s"$dir/dim")

    val expected = 50L * 64 // 50 rows per key × 64 hot keys

    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production default demands a ≥10 GB application side; shrink it
      // so the 200k-row local fact qualifies
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // force a shuffle join — broadcast joins don't need runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"attr" === "hot")
      val q = fact.join(dim, "k")
      val plan = physicalPlan(q)
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n$plan")
      assert(q.count() == expected)
    }
  }
}
