package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q204 (last-touch attribution) beyond the DuckDB oracle (which runs
  * the same IGNORE-NULLS window): a driver-side brute force that scans
  * each user's sorted history directly — for every purchase, walk
  * backwards to the first non-purchase event — so the carry frame's
  * semantics (strictly-before, last one wins, 7-day lookback, '(none)'
  * fallback) are re-derived without window machinery. */
class AttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private val LookbackUs = 604800000000L

  private lazy val brute: Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.col
    val byUser = T.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("tus"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val attrs = byUser.values.flatMap { rows =>
      val h = rows.sortBy(r => (r._3, r._2)) // (tus, event_id)
      h.indices.collect {
        case i if h(i)._4 == "purchase" =>
          val prior = h.take(i).filter(_._4 != "purchase")
          prior.lastOption match {
            case Some(p) if p._3 >= h(i)._3 - LookbackUs => p._4
            case _ => "(none)"
          }
      }
    }
    attrs.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
      .toSeq.sortBy(_._1)
  }

  test("q204 equals the backwards-walk brute force") {
    val got = NorthStar.q204Attribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == brute)
    assert(brute.map(_._1).exists(_ != "(none)"),
      "degenerate fixture: nothing ever attributed")
  }

  test("the carry skips clustered purchases: at least one purchase " +
    "whose IMMEDIATELY preceding event is also a purchase still " +
    "attributes to a real type (the property lag(1) cannot express)") {
    import org.apache.spark.sql.functions.col
    val byUser = T.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("tus"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val exists = byUser.values.exists { rows =>
      val h = rows.sortBy(r => (r._3, r._2))
      h.indices.exists { i =>
        i > 0 && h(i)._4 == "purchase" && h(i - 1)._4 == "purchase" &&
          h.take(i).exists(_._4 != "purchase")
      }
    }
    assert(exists, "fixture never clusters purchases — carry untested")
  }
}
