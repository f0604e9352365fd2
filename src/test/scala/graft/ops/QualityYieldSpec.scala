package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q314 — the quality-filter yield curve. Driver-side recompute from
  * the GRADED q83 frame plus the monotonicity/completeness properties
  * that make the curve a usable decision input. */
class QualityYieldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("q314 equals a driver-side recompute from q83's graded scores; " +
    "the curve is complete at t=0, monotone, and genuinely selective") {
    val per = TrainingData.q83QualityScore(spark, dir)
      .select(expr("cast(round(quality * 10000) as bigint)").as("qbp"),
        col("n_words"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (td, tt) = (per.length.toLong, per.map(_._2).sum)
    val maxBucket = per.map(_._1 / 1000).max
    val want = (0L to maxBucket).map { t =>
      val kept = per.filter(_._1 / 1000 >= t)
      val (nd, nt) = (kept.length.toLong, kept.map(_._2).sum)
      (t, nd, nt, nd * 10000L / td, nt * 10000L / tt)
    }.toSet
    val got = Curation.q314QualityYieldCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want, "yield curve diverged from the driver recompute")
    // t = 0 admits everything (the curve's completeness anchor)
    assert(got.contains((0L, td, tt, 10000L, 10000L)),
      "t=0 row must be the whole corpus")
    // monotone non-increasing in both docs and tokens
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 <= a._2 && b._3 <= a._3, s"curve not monotone at ${b._1}")
      case _ => ()
    }
    // the cutoff genuinely bites somewhere (a flat curve prices nothing)
    assert(sorted.last._2 < td, "no threshold excluded any document")
  }
}
