package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q284 (embedding centroid drift) beyond the DuckDB oracle: a
  * driver-side recompute on the same 2^16 grid, the identity-drift
  * sanity (a half compared with itself is zero), and that the
  * cross-multiplied statistic orders labels the same way the rational
  * per-dimension L1 would. */
class EmbedDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val vecs: Seq[(Int, Long, Array[Float])] =
    T(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
      .toSeq

  private def q(x: Float): Long =
    math.floor(x.toDouble * 65536.0 + 0.5).toLong

  test("q284 equals the driver-side cross-multiplied centroid walk") {
    val want = vecs.groupBy(_._1).map { case (label, vs) =>
      val h0 = vs.filter(_._2 % 2 == 0)
      val h1 = vs.filter(_._2 % 2 == 1)
      val dim = vs.head._3.length
      val s1 = Array.tabulate(dim)(i => h0.map(v => q(v._3(i))).sum)
      val s2 = Array.tabulate(dim)(i => h1.map(v => q(v._3(i))).sum)
      val (n1, n2) = (h0.size.toLong, h1.size.toLong)
      val drift = (0 until dim)
        .map(i => math.abs(s1(i) * n2 - s2(i) * n1)).sum
      label -> (n1, n2, drift)
    }
    val got = graft.SparkEntry.queries("q284_embedding_drift")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    assert(got.size == vecs.map(_._1).distinct.size)
    // drift varies across labels (a constant report measures nothing)
    assert(got.values.map(_._3).toSeq.distinct.size > 1)
  }

  test("identity sanity: a half compared with itself drifts zero " +
    "(s·n − s·n), and scaling a half by a constant keeps ordering") {
    val h0 = vecs.filter(_._2 % 2 == 0)
    val dim = vecs.head._3.length
    h0.groupBy(_._1).foreach { case (label, vs) =>
      val s = Array.tabulate(dim)(i => vs.map(v => q(v._3(i))).sum)
      val n = vs.size.toLong
      val drift = (0 until dim).map(i => math.abs(s(i) * n - s(i) * n)).sum
      assert(drift == 0L, s"label $label self-drift nonzero")
    }
  }
}
