package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q239 (synchronous label propagation) beyond the DuckDB oracle: a
  * driver-side adjacency-map LPA with the explicit (count desc, label
  * asc) argmax — no packing — proving the packed-BIGINT tie-break
  * implements exactly that ordering; plus packing-headroom and
  * genuine-coarsening invariants. */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** Undirected adjacency of the support-≥2 co-purchase graph. */
  private lazy val adj: Map[Long, Seq[Long]] = {
    val pairs = Affinity.pairCounts(Affinity.basketItems(spark, dir))
      .filter(col("n_pair") >= 2).select("p1", "p2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (n, v) => n -> v.map(_._2).toSeq }
  }

  /** Driver-side synchronous LPA with the EXPLICIT tie-break. */
  private lazy val finalLabels: Map[Long, Long] = {
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LpIters) {
      lab = lab.map { case (n, old) =>
        val votes = adj(n).map(lab).groupBy(identity)
          .map { case (l, v) => (l, v.size) }
        n -> (if (votes.isEmpty) old
              else votes.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }
    }
    lab
  }

  test("q239 equals the driver-side LPA brute force (explicit argmax, " +
    "no packing) — community histogram, top-20 cut, and global count") {
    val hist = finalLabels.values.groupBy(identity)
      .map { case (l, v) => (l, v.size.toLong) }
    val expect = hist.toSeq.sortBy { case (l, n) => (-n, l) }.take(20)
      .map { case (l, n) => (l, n, hist.size.toLong) }
    val got = Graph.q239LabelProp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("packing headroom: every vote count and label on the fixture sits " +
    "far inside the 2⁴⁰ packing (the documented widening boundary)") {
    val maxDeg = adj.values.map(_.size).max.toLong
    val maxLab = adj.keys.max
    assert(maxDeg < (1L << 23), s"degree $maxDeg")
    assert(maxLab < Graph.LpPack, s"label $maxLab")
  }

  test("LPA genuinely coarsens: fewer communities than nodes, more " +
    "than one (a degenerate fixture would pin nothing)") {
    val n = finalLabels.size
    val c = finalLabels.values.toSet.size
    assert(c < n && c > 1, s"$c communities over $n nodes")
  }

  test("labels stay in the node universe (mode of existing labels can " +
    "never invent a value)") {
    assert(finalLabels.values.toSet.subsetOf(adj.keySet))
  }
}
