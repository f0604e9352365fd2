package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q242 (cross-source quantile normalization) beyond the DuckDB oracle:
  * a driver-side ntile-layout recomputation of both distributions, the
  * alignment property that IS the point of the op (equal-sized sources
  * end up with identical normalized multisets), and within-source
  * monotonicity. */
class QuantileNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val B = Corpus.NormBuckets

  /** SQL ntile bucket of 1-based rank rn among n rows. */
  private def ntileOf(rn: Long, n: Long): Int = {
    val q = n / B; val r = n % B; val cut = r * (q + 1)
    (if (rn <= cut) (rn - 1) / (q + 1)
     else r + (rn - cut - 1) / math.max(q, 1L)).toInt + 1
  }

  private lazy val docs =
    T(spark, dir, "documents").select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  private lazy val got =
    Corpus.q242QuantileNormalize(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toMap

  test("q242 equals the driver-side double-ntile brute force on every " +
    "document") {
    val globalSorted = docs.sortBy(d => (d._3, d._1))
    val gBucket = globalSorted.zipWithIndex
      .map { case (d, i) => d._1 -> ntileOf(i + 1L, docs.length.toLong) }
      .toMap
    val refHi = globalSorted.zipWithIndex
      .groupBy { case (d, i) => gBucket(d._1) }
      .map { case (b, v) => b -> v.map(_._1._3).max }
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, v) =>
      val sorted = v.sortBy(d => (d._3, d._1))
      sorted.zipWithIndex.map { case (d, i) =>
        val sb = ntileOf(i + 1L, v.length.toLong)
        d._1 -> ((src, d._3, sb, refHi(sb)))
      }
    }.toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, v) => assert(got(k) == v, s"doc $k") }
  }

  test("alignment — the point of quantile normalization: every source " +
    "has the same size here, so all sources' normalized multisets are " +
    "IDENTICAL even though their raw length distributions differ") {
    val bySrc = got.values.groupBy(_._1)
      .map { case (s, v) => s -> v.map(_._4).toSeq.sorted }
    assert(bySrc.size > 1)
    assert(bySrc.values.toSet.size == 1,
      "normalized multisets differ across equal-sized sources")
    val rawBySrc = got.values.groupBy(_._1)
      .map { case (s, v) => s -> v.map(_._2).toSeq.sorted }
    assert(rawBySrc.values.toSet.size > 1,
      "raw distributions were already identical — fixture pins nothing")
  }

  test("within-source monotonicity: along the (n_chars, doc_id) sort " +
    "order — the op's own total order — norms never decrease") {
    got.toSeq.groupBy(_._2._1).foreach { case (src, v) =>
      v.sortBy { case (k, (_, nc, _, _)) => (nc, k) }
        .map(_._2._4).sliding(2).foreach {
          case Seq(a, b) => assert(a <= b, s"source $src")
          case _ =>
        }
    }
  }
}
