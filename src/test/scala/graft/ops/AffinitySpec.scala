package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q200 (co-purchase pair mining) beyond the DuckDB oracle: a
  * driver-side brute force over the raw lineitem rows, plus the two
  * plan properties that make the shape scale — the self-join reuses
  * one exchange, and the top-k never global-sorts. */
class AffinitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val bruteTop: Seq[(Long, Long, Long)] = {
    import org.apache.spark.sql.functions.col
    val baskets = T(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (b <- baskets; i <- b.indices; j <- (i + 1) until b.size)
      counts((b(i), b(j))) = counts.getOrElse((b(i), b(j)), 0L) + 1
    counts.toSeq.map { case ((p1, p2), n) => (p1, p2, n) }
      .sortBy { case (p1, p2, n) => (-n, p1, p2) }.take(25)
  }

  test("q200 equals the driver-side brute force (multiplicity-deduped, " +
    "canonical pair order, full tie-break)") {
    val got = Affinity.q200Copurchase(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == bruteTop)
    assert(bruteTop.exists(_._3 > 1),
      "degenerate fixture: no pair co-occurs twice")
  }

  test("at scale (broadcast off — the 100 TB regime) the self-join " +
    "reuses ONE exchange; the top-25 plans as TakeOrderedAndProject") {
    SparkTestBase.withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = Affinity.q200Copurchase(spark, dir)
      df.collect() // AQE finalizes reuse decisions at execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), plan)
      assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
        s"self-join did not reuse the items exchange:\n$plan")
    }
  }
}
