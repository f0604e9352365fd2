package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q186 temperature mix: the Hamilton apportionment must spend the
  * budget exactly, the per-source draw must take exactly
  * min(alloc, n) docs, the √n flattening must up-weight small sources
  * relative to proportional allocation, and the selection must be
  * rerun-deterministic (md5 tickets, no RNG). */
class TemperatureMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val counts: Map[String, Long] =
    T(spark, SparkTestBase.Sf0001, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private lazy val got =
    TrainingData.q186TemperatureMix(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))

  test("the apportionment spends the budget exactly: sum(alloc) == " +
    "floor(total/2), and every source's draw is min(alloc, n)") {
    val total = counts.values.sum
    val allocBySrc = got.groupBy(_._1).map { case (s, rows) =>
      s -> rows.head._4
    }
    assert(allocBySrc.values.sum == total / 2,
      s"Hamilton must spend the budget exactly: $allocBySrc")
    val drawn = got.groupBy(_._1).map { case (s, rows) => s -> rows.length }
    allocBySrc.foreach { case (s, a) =>
      assert(drawn(s).toLong == math.min(a, counts(s)),
        s"source $s drew ${drawn(s)} of alloc $a (n=${counts(s)})")
    }
  }

  test("sqrt flattening: every below-average source gets a LARGER " +
    "budget share than its document share (and above-average smaller)") {
    val total = counts.values.sum.toDouble
    val budget = (counts.values.sum / 2).toDouble
    val allocBySrc = got.groupBy(_._1).map { case (s, rows) =>
      s -> rows.head._4.toDouble
    }
    // √-proportional shares cross raw-proportional shares exactly at
    // the mean source size (w_s/W vs n_s/N order-swaps there); ±1 seat
    // of Hamilton rounding is the only permitted wobble
    counts.foreach { case (s, n) =>
      val docShare = n / total
      val mixShare = allocBySrc(s) / budget
      if (n.toDouble < total / counts.size * 0.9)
        assert(mixShare > docShare - 1.0 / budget,
          s"small source $s was not up-weighted: $mixShare vs $docShare")
      if (n.toDouble > total / counts.size * 1.1)
        assert(mixShare < docShare + 1.0 / budget,
          s"big source $s was not flattened: $mixShare vs $docShare")
    }
  }

  test("per-source ranks are contiguous 1..drawn and tickets ascend " +
    "within a source (lowest-ticket draw, deterministic)") {
    got.groupBy(_._1).foreach { case (s, rows) =>
      val rs = rows.map(_._3).sorted
      assert(rs.toSeq == (1L to rs.length).toSeq,
        s"source $s ranks not contiguous: ${rs.toSeq}")
    }
    val again = TrainingData.q186TemperatureMix(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == again.toSeq, "rerun changed the selection")
  }
}
