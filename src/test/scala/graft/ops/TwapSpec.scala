package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q206 (time-weighted average) beyond the DuckDB oracle (which runs the
  * same lead-segment formulation): a driver-side brute force in BigInt
  * from the raw event rows — independent segmenting (sort-and-zip, no
  * window machinery) — plus the property that motivates duration
  * weighting at all: on irregularly sampled streams the TWAP must
  * actually differ from the row-weighted mean somewhere. */
class TwapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val byUser: Map[Long, Seq[(Long, Long, Long)]] = {
    import org.apache.spark.sql.functions._
    T.events(spark, dir)
      .select(col("user_id"), col("tus"), col("event_id"),
        expr("cast(floor(cast(value as double) * 65536.0 + 0.5) as bigint)"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).sortBy(t => (t._1, t._2)).toSeq }
  }

  private lazy val brute: Seq[(Long, Long, Long, Long)] =
    byUser.toSeq.flatMap { case (u, evs) =>
      val segs = evs.zip(evs.tail).map { case ((t1, _, v), (t2, _, _)) => (t2 - t1, v) }
      val den = segs.map(_._1).sum
      if (segs.isEmpty || den == 0) None
      else {
        val num = segs.map { case (d, v) => BigInt(v) * d }.sum
        val fx = ((2 * num + den) / (2 * BigInt(den))).toLong
        Some((u, segs.size.toLong, den, fx))
      }
    }.sortBy(_._1)

  test("q206 equals the independent BigInt brute force") {
    val got = NorthStar.q206Twap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == brute)
    assert(brute.nonEmpty)
  }

  test("duration weighting is load-bearing: some user's TWAP differs " +
    "from the unweighted row mean of the same segment values") {
    val differs = byUser.exists { case (u, evs) =>
      val segs = evs.zip(evs.tail).map { case ((t1, _, v), (t2, _, _)) => (t2 - t1, v) }
      val den = segs.map(_._1).sum
      segs.nonEmpty && den > 0 && {
        val fx = brute.find(_._1 == u).get._4
        val rowMean = ((2 * segs.map(s => BigInt(s._2)).sum + segs.size) /
          (2 * BigInt(segs.size))).toLong
        fx != rowMean
      }
    }
    assert(differs, "fixture degenerate: TWAP == row mean for every user")
  }

  test("twap column is exactly twap_fx / 2^16 (one exact binary division)") {
    NorthStar.q206Twap(spark, dir).collect().foreach { r =>
      assert(r.getDouble(4) == r.getLong(3).toDouble / 65536.0)
    }
  }
}
