package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q229 (Pareto frontier) beyond the DuckDB NOT-EXISTS oracle: the
  * dominance relation is brute-forced driver-side over every document
  * pair (O(n²) in plain Scala — fine at sf0.001), so a sweep that
  * agreed with its own declarative twin but mis-collapsed ties or
  * mis-ordered the prefix max would fail here. Plus the structural
  * staircase facts the frontier must satisfy. */
class ParetoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val metrics: Array[(Long, Long, Long)] =
    T(spark, dir, "documents")
      .select(col("doc_id"),
        size(expr("array_distinct(filter(split(text, ' '), x -> x != ''))"))
          .cast("long"),
        graft.functions.Bpe.count(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private lazy val got: Array[(Long, Long, Long)] =
    Curation.q229ParetoFrontier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("q229 equals the brute-forced non-dominated set with " +
    "per-(cost, diversity) smallest-doc representatives") {
    // dominance on (maximize n_lex, minimize btok)
    def dominated(p: (Long, Long, Long)): Boolean = metrics.exists(o =>
      o._2 >= p._2 && o._3 <= p._3 && (o._2 > p._2 || o._3 < p._3))
    val frontier = metrics.filterNot(dominated)
    val expected = frontier.groupBy(p => (p._3, p._2)).map {
      case ((btok, nLex), ps) => (ps.map(_._1).min, nLex, btok)
    }.toArray.sortBy(_._3)
    assert(got.sortBy(_._3).toSeq == expected.toSeq,
      s"got ${got.length} rows, expected ${expected.length}")
    assert(got.nonEmpty && got.length < metrics.length,
      "frontier must be a strict, non-empty subset")
  }

  test("the frontier is a staircase: strictly increasing diversity " +
    "along strictly increasing cost") {
    val byCost = got.sortBy(_._3)
    byCost.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 < b._3, "distinct costs")
        assert(a._2 < b._2, "diversity strictly increases with cost")
      case _ => ()
    }
  }
}
