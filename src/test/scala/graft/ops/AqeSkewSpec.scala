package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins AQE's built-in skew-join splitting — the first line of defense
  * SURVEY §4.4 assigns to hot-key joins (graft.ops.SkewJoin's manual
  * salting is the fallback for skew AQE can't split, e.g. broadcast-
  * ineligible aggregations). Conf-driven and silent when disabled, so
  * like RuntimeFilterSpec this is an enforcement test: one key owning
  * ~90% of the fact rows must yield a SortMergeJoin marked skew=true
  * in the FINAL adaptive plan, with correct results. */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) =>
      k -> (try Option(spark.conf.get(k)) catch { case _: Exception => None })
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle-join partition (skew=true in final plan)") {
    import spark.implicits._
    // key 0 owns 90% of 200k rows; keys 1..999 share the rest
    val fact = spark.range(200000).select(
      when(col("id") % 10 =!= 0, lit(0L))
        .otherwise(col("id") % 1000 + 1).as("k"),
      col("id").as("v"))
    val dim = spark.range(1001).select(
      col("id").as("k"), concat(lit("d"), col("id")).as("tag"))

    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // local row counts are tiny; shrink the thresholds so the hot
      // partition registers as skewed (same knobs a deployment tunes)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force the shuffle join path — broadcast would dodge the skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      val q = fact.join(dim, "k").groupBy("tag").agg(sum("v").as("s"))
      val rows = q.collect() // executing materializes the FINAL plan
      // fact keys: 0 (hot) plus (id%1000)+1 for id%10==0 → {1,11,…,991}
      assert(rows.length == 101, s"got ${rows.length} groups")

      val finalPlan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"no skew-split join in final adaptive plan:\n$finalPlan")

      // and the hot key's group is exact: sum of ids not divisible by 10
      val hot = q.filter(col("tag") === "d0").head.getLong(1)
      val expected = (0L until 200000L).filter(_ % 10 != 0).sum
      assert(hot == expected)
    }
  }
}
