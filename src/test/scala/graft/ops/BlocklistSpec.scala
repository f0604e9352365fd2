package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q245 (blocklist filtering) beyond the DuckDB oracle: a driver-side
  * token-count brute force, the threshold boundary (occurrence-count
  * semantics, not presence), and that both verdict branches genuinely
  * fire on the fixture. */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val perDoc: Seq[(String, Long, Long)] =
    T(spark, dir, "documents").select("source", "n_chars", "text")
      .collect().map { r =>
        val bc = r.getString(2).split(" ", -1)
          .count(Curation.BlockTerms.contains).toLong
        (r.getString(0), r.getLong(1), bc)
      }.toSeq

  test("q245 equals the driver-side occurrence-count brute force, " +
    "per source") {
    val expect = perDoc.groupBy(_._1).map { case (src, v) =>
      src -> ((v.size.toLong,
        v.count(_._3 >= Curation.BlockMax).toLong,
        v.map(_._3).sum,
        v.filter(_._3 < Curation.BlockMax).map(_._2).sum))
    }
    val got = Curation.q245BlocklistFilter(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
  }

  test("threshold semantics: occurrence COUNT, not presence — docs " +
    "with 1..2 blocked tokens survive, docs at the threshold drop") {
    assert(perDoc.exists(d => d._3 > 0 && d._3 < Curation.BlockMax),
      "no sub-threshold doc with hits — presence vs count is untested")
    assert(perDoc.exists(_._3 >= Curation.BlockMax))
    assert(perDoc.exists(_._3 == 0L))
  }

  test("both verdict branches fire in the graded output") {
    val got = Curation.q245BlocklistFilter(spark, dir).collect()
    assert(got.exists(_.getLong(2) > 0))
    assert(got.exists(r => r.getLong(1) > r.getLong(2)))
  }
}
