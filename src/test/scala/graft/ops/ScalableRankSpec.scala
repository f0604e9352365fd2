package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ScalableRank must agree exactly with the built-in global window
  * (row_number / ntile) — the point is the plan, not the answer. */
class ScalableRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def df = (1 to 103).map(i => (i.toLong, (i * 37 % 101).toDouble))
    .toDF("id", "v")

  test("global row_number matches single-task window") {
    val sortKeys = Seq(col("v").desc, col("id").asc)
    val got = ScalableRank.withGlobalRowNumber(df, "rn", sortKeys: _*)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rn", row_number().over(Window.orderBy(sortKeys: _*)))
      .select("id", "rn").as[(Long, Int)].collect()
      .map { case (k, v) => (k, v.toLong) }.toMap
    assert(got == want)
  }

  test("ntile matches single-task window, incl. uneven bucket sizes") {
    for (n <- Seq(4, 7)) {
      val sortKeys = Seq(col("v").desc, col("id").asc)
      val got = ScalableRank.withNtile(df, n, "b", sortKeys: _*)
        .select("id", "b").as[(Long, Int)].collect().toMap
      val want = df
        .withColumn("b", ntile(n).over(Window.orderBy(sortKeys: _*)))
        .select("id", "b").as[(Long, Int)].collect().toMap
      assert(got == want, s"ntile($n)")
    }
  }

  test("global exclusive cumsum matches single-task window") {
    val sortKeys = Seq(col("id").asc)
    val got = ScalableRank
      .withGlobalCumsumExclusive(df, col("v"), "c", sortKeys: _*)
      .select("id", "c").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("c", coalesce(sum(col("v").cast("long")).over(w), lit(0L)))
      .select("id", "c").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("global lag matches single-task window — including null values " +
    "carried across partition boundaries") {
    val sortKeys = Seq(col("id").asc)
    // plant nulls, including at positions likely to land on partition
    // edges, so the boundary carry is exercised with null payloads
    val withNulls = df.withColumn("v2",
      when(col("id") % 9 === 0, lit(null)).otherwise(col("v").cast("long")))
    val got = ScalableRank
      .withGlobalLag(withNulls, col("v2"), "p", sortKeys: _*)
      .select("id", "p").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val want = withNulls
      .withColumn("p", lag(col("v2"), 1).over(Window.orderBy(sortKeys: _*)))
      .select("id", "p").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == want)
    assert(want.values.toSeq.count(_.isEmpty) > 1,
      "fixture has no null lags beyond the first row — carry untested")
  }

  test("q45 plan has no unpartitioned window (scale guard)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = Relational.q45WinNtile(spark, SparkTestBase.Sf0001)
      .queryExecution.optimizedPlan
    val globalWindows = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"unpartitioned (single-task) window in plan:\n$plan")
  }

  test("engine invariant: monotonically_increasing_id packs the " +
    "partition id above bit 33 with contiguous local indices from 0") {
    // The rank pass projects pid = _mid >> 33 and local rank =
    // _mid & (2^33 - 1) off Spark's documented id layout, and the
    // running-aggregate scans pair TaskContext partition ids with
    // spark_partition_id()-keyed offsets. Both rest on implementation
    // details a Spark upgrade could change silently — this pins them so
    // an engine bump fails HERE, not downstream at the oracle gate
    // (r18, the r17 advice item).
    val parts = df.repartitionByRange(4, col("v"), col("id"))
      .sortWithinPartitions(col("v"), col("id"))
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val rows = parts
      .select(spark_partition_id().as("pid"), col("_mid"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert((r.getLong(1) >> 33) == r.getInt(0).toLong,
      s"pid ${r.getInt(0)} not in _mid high bits: ${r.getLong(1)}"))
    rows.groupBy(_.getInt(0)).foreach { case (pid, rs) =>
      val locals = rs.map(_.getLong(1) & ((1L << 33) - 1)).sorted.toSeq
      assert(locals == (0L until locals.length.toLong),
        s"partition $pid local indices not contiguous from 0: $locals")
    }
  }
}
