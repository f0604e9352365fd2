package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q218 (triangle counting) beyond the DuckDB oracle (which enumerates
  * x<y<z triples with NO orientation): a driver-side brute force over
  * an adjacency-set representation, plus the property the degree
  * orientation must preserve — every triangle generated exactly once
  * (the totals agree with the unoriented enumeration), and the fixture
  * is genuinely triangular. */
class TriangleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  /** Undirected support-≥2 co-purchase edges, brute-forced from raw. */
  private lazy val edges: Set[(Long, Long)] = {
    val items = T(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (lng(r, 0), lng(r, 1))).distinct
    items.groupBy(_._1).values
      .flatMap { b =>
        val ps = b.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
      }
      // filter + keySet, NOT Map.collect yielding the pair: collect on
      // a Map with Tuple2 results rebuilds a MAP, silently collapsing
      // (p1, p2) keys by p1
      .groupBy(identity).filter(_._2.size >= 2).keySet
  }

  private lazy val bruteTriangles: Seq[(Long, Long, Long)] = {
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    edges.toSeq.flatMap { case (x, y) => // x < y; close with z > y
      (adj(x) intersect adj(y)).filter(_ > y).toSeq.sorted.map(z => (x, y, z))
    }
  }

  test("q218 equals the unoriented brute force: per-node counts, " +
    "global total, top-20 tie-break") {
    val perNode = bruteTriangles.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => (n, xs.size.toLong) }
    val expTop = perNode.toSeq
      .sortBy { case (n, c) => (-c, n) }.take(20)
      .map { case (n, c) => (n, c, bruteTriangles.size.toLong) }
    val got = Graph.q218Triangles(spark, dir).collect()
      .map(r => (lng(r, 0), lng(r, 1), lng(r, 2))).toSeq
    assert(got == expTop)
  }

  test("the fixture is genuinely triangular and the orientation " +
    "generated each triangle exactly once") {
    assert(bruteTriangles.nonEmpty, "no triangles — fixture degenerate")
    // exactly-once: the op's global total (3rd column, same on every
    // row) equals the size of the DEDUPLICATED unoriented triangle set
    val tot = Graph.q218Triangles(spark, dir).collect().map(lng(_, 2)).distinct
    assert(tot.toSeq == Seq(bruteTriangles.distinct.size.toLong))
    // and participation mass balances: Σ per-node = 3 × total
    val mass = bruteTriangles.size.toLong * 3
    val perNodeSum = bruteTriangles.flatMap(t => Seq(t._1, t._2, t._3)).size.toLong
    assert(perNodeSum == mass)
  }
}
