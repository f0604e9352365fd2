package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q187 contamination attribution: the struct-max argmax must equal a
  * literal driver-side brute force over the shared-shingle pair counts
  * (including the highest-count-then-lowest-eval-doc tie discipline),
  * and the attributed doc set must be exactly q95's flagged set. */
class ContamAttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("argmax equals brute force and the doc set equals q95's flags") {
    val dir = SparkTestBase.Sf0001
    val got = Curation.q187ContamAttribution(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // brute force: per-doc distinct shingle sets on the driver
    val docs = T(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").sliding(3)
          .filter(_.length == 3).map(_.mkString(" ")).toSet)
      .toMap
    val evalDocs = docs.filter(_._1 % 97 == 0)
    val expected = docs.filter(_._1 % 97 != 0).flatMap { case (id, ss) =>
      val shared = evalDocs.toSeq
        .map { case (eid, es) => (eid, (ss & es).size) }
        .filter(_._2 > 0)
      if (shared.isEmpty) None
      else {
        val (eid, n) = shared.minBy { case (eid, n) => (-n, eid) }
        Some((id, eid, n.toLong))
      }
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected, "attribution diverged from brute force")
    assert(got.nonEmpty, "degenerate fixture: nothing contaminated")

    val q95Docs = Curation.q95Decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == q95Docs,
      "attributed docs != q95 flagged docs")
  }
}
