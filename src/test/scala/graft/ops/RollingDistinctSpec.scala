package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q222 (rolling 7-day distinct users) beyond the DuckDB oracle (which
  * runs the RANGE-JOIN lowering against the explode lowering — the
  * hash match is the equivalence proof): a direct per-day set brute
  * force, plus the properties that make the metric trustworthy —
  * rolling ≥ daily distinct (windows only add), rolling ≤ total
  * distinct users, the window genuinely aggregates (some day's rolling
  * count exceeds its single-day count), and only event-bearing days
  * are reported. */
class RollingDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val DayUs = 86400000000L

  private lazy val dayUsers: Map[Long, Set[Long]] =
    T.events(spark, dir).selectExpr(s"tus div $DayUs as day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }

  private lazy val got: Map[Long, Long] =
    NorthStar.q222RollingDistinct(spark, dir).collect()
      .map(r => r.getLong(0) / DayUs -> r.getLong(1)).toMap

  test("q222 equals the per-day set-union brute force") {
    val expected = dayUsers.keys.map { d =>
      d -> (d - 6 to d).flatMap(dayUsers.get).flatten.toSet.size.toLong
    }.toMap
    assert(got == expected)
  }

  test("metric properties: bounds, genuine aggregation, event-bearing " +
    "days only") {
    val allUsers = dayUsers.values.flatten.toSet.size.toLong
    got.foreach { case (d, n) =>
      assert(dayUsers.contains(d), s"day $d reported without events")
      assert(n >= dayUsers(d).size.toLong, s"day $d below daily distinct")
      assert(n <= allUsers, s"day $d above population")
    }
    assert(got.exists { case (d, n) => n > dayUsers(d).size.toLong },
      "fixture degenerate: no window ever exceeds its own day")
  }
}
