package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q243 (3-D skyline via local frontiers) beyond the DuckDB oracle: an
  * O(n²) driver-side dominance brute force over the full corpus,
  * soundness (frontier members are mutually non-dominated),
  * completeness (every dropped doc is dominated by a FRONTIER member —
  * the transitivity argument the two-phase merge rests on), and the
  * 2-D relationship that justifies shipping a second op at all. */
class Skyline3dSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** (doc_id, n_lex, btok, n_chars) for the whole corpus. */
  private lazy val tuples: Seq[(Long, Long, Long, Long)] =
    T(spark, dir, "documents").select(col("doc_id"),
        size(expr("array_distinct(filter(split(text, ' '), x -> x != ''))"))
          .cast("long").as("n_lex"),
        graft.functions.Bpe.count(col("text")).as("btok"),
        col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private def dom(o: (Long, Long, Long, Long),
                  t: (Long, Long, Long, Long)): Boolean =
    o._2 >= t._2 && o._3 <= t._3 && o._4 <= t._4 &&
      (o._2 > t._2 || o._3 < t._3 || o._4 < t._4)

  private lazy val expect: Set[Long] =
    tuples.filter(t => !tuples.exists(o => dom(o, t))).map(_._1).toSet

  private lazy val got: Seq[(Long, Long, Long, Long)] =
    Curation.q243Skyline3d(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("q243 equals the O(n²) driver-side dominance brute force — " +
    "id set and carried objective values") {
    assert(got.map(_._1).toSet == expect)
    val byId = tuples.map(t => t._1 -> t).toMap
    got.foreach(t => assert(byId(t._1) == t, s"doc ${t._1}"))
  }

  test("soundness: no frontier member dominates another") {
    got.foreach(a => got.foreach(b =>
      assert(a == b || !dom(a, b), s"${a._1} dominates ${b._1}")))
  }

  test("completeness via transitivity: every dropped document is " +
    "dominated by a FRONTIER member (not merely by someone) — the " +
    "property the two-phase local-frontier merge rests on") {
    val dropped = tuples.filterNot(t => expect(t._1))
    assert(dropped.nonEmpty, "nothing dominated — fixture pins nothing")
    dropped.foreach { t =>
      assert(got.exists(f => dom(f, t)), s"doc ${t._1}")
    }
  }

  test("the third axis earns its keep: the 3-D frontier differs from " +
    "q229's 2-D frontier (otherwise the op adds nothing)") {
    val twoD = Curation.q229ParetoFrontier(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(expect != twoD)
    // and it can only grow or re-rank, never shrink below the 2-D
    // frontier's size: dropping an axis merges dominance classes
    assert(expect.size >= twoD.size)
  }
}
