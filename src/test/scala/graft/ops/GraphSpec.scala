package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q196 (fixed-point PageRank) beyond the DuckDB oracle: a driver-side
  * brute-force recomputation of the 3 integer iterations on sf0.001,
  * the floor-only mass property, and the top-k plan shape. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val edges: Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions.col
    T(spark, dir, "lineitem").select("l_orderkey", "l_suppkey")
      .join(T(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("s"), (col("o_custkey") * 2 + 1).as("c"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSeq
  }

  private def bruteRanks(): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = outdeg.keySet
    var pr: Map[Long, Long] = nodes.map(_ -> 1048576L).toMap
    for (_ <- 1 to Graph.PrIters) {
      val contrib = edges
        .map { case (src, dst) => dst -> (pr(src) * 85) / (outdeg(src) * 100) }
        .groupBy(_._1).map { case (n, cs) => n -> cs.map(_._2).sum }
      pr = nodes.map(n => n -> (157286L + contrib.getOrElse(n, 0L))).toMap
    }
    pr
  }

  test("q196 equals the driver-side integer brute force (full rank " +
    "table, not just the top 20)") {
    val expect = bruteRanks()
    val top = expect.toSeq.sortBy { case (n, p) => (-p, n) }.take(20)
      .map { case (n, p) => (n, if (n % 2 == 0) "s" else "c", p) }
    val got = Graph.q196PageRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == top)
    assert(got.map(_._2).distinct.size == 2,
      "degenerate fixture: top-20 is single-kind")
  }

  test("floors only LOSE mass: every rank >= the damping base and " +
    "total mass never exceeds the uniform start") {
    val pr = bruteRanks()
    assert(pr.values.forall(_ >= 157286L))
    assert(pr.values.map(BigInt(_)).sum <= BigInt(pr.size) * 1048576L)
  }

  test("the top-20 plans as TakeOrderedAndProject, not a global sort") {
    val plan = Graph.q196PageRank(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
