package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q252 beyond the DuckDB oracle (which states the same window form):
  * an INDEPENDENT driver-side sweep-merge brute force over the full
  * corpus, and the engulfing fixture that separates the cummax island
  * rule from the lag(end) one — the bug class this op exists to pin. */
class IntervalUnionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** Sequential interval union: sort by (s, id), merge into islands by
    * the same strict-gap rule, return (n_intervals, n_islands,
    * covered, span). */
  private def brute(iv: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val sorted = iv.sorted
    var islands = 0L
    var covered = 0L
    var curS = 0L
    var curE = Long.MinValue
    var started = false
    sorted.foreach { case (s, e) =>
      if (!started || s > curE) {
        if (started) covered += curE - curS
        islands += 1; curS = s; curE = e; started = true
      } else if (e > curE) curE = e
    }
    if (started) covered += curE - curS
    val span = if (sorted.isEmpty) 0L else sorted.map(_._2).max - sorted.map(_._1).min
    (sorted.size.toLong, islands, covered, span)
  }

  test("q252 equals the driver-side sweep-merge on the full corpus") {
    val got = graft.SparkEntry.queries("q252_interval_union")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val raw = T.events(spark, dir)
      .select(col("user_id"), col("tus"),
        expr("cast(floor(cast(value as double) * 1000000.0 + 0.5) as bigint)")
          .as("dur"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = raw.groupBy(_._1).map { case (u, rows) =>
      u -> brute(rows.map(r => (r._2, r._2 + r._3)).toSeq)
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (u, w) =>
      assert(got(u) == w, s"user $u: got ${got(u)}, brute $w")
    }
    // the fixture must exercise genuine merging somewhere, or the
    // islands logic is pinned by nothing
    assert(want.exists { case (_, (n, i, _, _)) => i < n },
      "corpus has no overlapping intervals — fixture pins nothing")
  }

  test("engulfing interval: cummax keeps covering after shorter " +
    "followers end (lag(end) would split the island)") {
    import spark.implicits._
    // [0, 100) engulfs [10, 20) and [30, 40); then a gap; then [150, 160).
    // lag-based logic would compare 30 > 20's end... and 110 > 40 — both
    // wrong island splits; cummax holds 100 until the true gap.
    val in = Seq(
      (1L, 1L, 0L, 100L),
      (1L, 2L, 10L, 10L),
      (1L, 3L, 30L, 10L),
      (1L, 4L, 150L, 10L),
    ).toDF("user_id", "event_id", "tus", "dur")
    val r = NorthStar.intervalUnionCore(in).collect()(0)
    assert(r.getAs[Long]("n_intervals") == 4L)
    assert(r.getAs[Long]("n_islands") == 2L)
    assert(r.getAs[Long]("covered_us") == 110L) // 100 + 10
    assert(r.getAs[Long]("span_us") == 160L)
    assert(r.getAs[Long]("util_bp") == 110L * 10000L / 160L)
  }

  test("touching half-open intervals merge; zero-span user defines " +
    "util_bp = 10000") {
    import spark.implicits._
    val in = Seq(
      (1L, 1L, 0L, 10L),   // [0, 10)
      (1L, 2L, 10L, 10L),  // [10, 20) — touches, merges
      (2L, 1L, 5L, 0L),    // zero-duration single event
    ).toDF("user_id", "event_id", "tus", "dur")
    val rs = NorthStar.intervalUnionCore(in).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rs(1L).getAs[Long]("n_islands") == 1L)
    assert(rs(1L).getAs[Long]("covered_us") == 20L)
    assert(rs(2L).getAs[Long]("covered_us") == 0L)
    assert(rs(2L).getAs[Long]("span_us") == 0L)
    assert(rs(2L).getAs[Long]("util_bp") == 10000L)
  }
}
