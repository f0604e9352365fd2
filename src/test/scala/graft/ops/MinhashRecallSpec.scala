package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q244 (MinHash recall vs exact Jaccard) beyond the DuckDB oracle:
  * component-consistency on the graded corpus (the gauge equals the
  * driver-side combination of its two shipped inputs), and — the part
  * the driver corpus cannot exercise, its near-dups being all-but
  * identical — a synthetic mid-S-curve fixture where the banding
  * GENUINELY misses true pairs and the gauge counts every miss. */
class MinhashRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("q244 equals the driver-side combination of the exact pair set " +
    "and the candidate pair set (each already oracle-checked via " +
    "q78/q72)") {
    val exact = TrainingData
      .ngramExactPairs(T(spark, dir, "documents"), Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2).toLong, r.getInt(3).toLong)).toMap
    val cand = TrainingData.minhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val buckets = exact.toSeq.map { case (k, (i, u)) =>
      (math.min(10 * i / u, 9L), if (cand(k)) 1L else 0L)
    }
    def row(b: Long, v: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val n = v.size.toLong; val c = v.map(_._2).sum
      (b, n, c, (2 * c * 10000 + n) / (2 * n))
    }
    val expect = (buckets.groupBy(_._1).map { case (b, v) => row(b, v) }
      .toSeq :+ row(-1L, buckets)).sortBy(_._1)
    val got = TrainingData.q244MinhashRecall(spark, dir).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("the miss branch is real: on a mid-S-curve synthetic fixture " +
    "(30 pairs at 3-gram Jaccard 13/23) the banding catches some true " +
    "pairs and misses others, and the gauge counts both exactly") {
    import spark.implicits._
    // doc 2k: 20 unique words; doc 2k+1: the first 15 words + 5 fresh —
    // 13 shared shingles of 18 each, jac = 13/23 ≈ 0.565 (above the
    // exact threshold, so every pair is ground truth); band-catch
    // probability per pair ≈ 1 − (1 − 0.565²)⁴ ≈ 0.79 under 4 bands ×
    // 2 rows, so both branches fire with near-certainty over 30 pairs
    // (and the md5 family makes the outcome deterministic)
    val docs = (0 until 30).flatMap { k =>
      val base = (0 until 20).map(i => s"w${k}_$i")
      val variant = base.take(15) ++ (0 until 5).map(i => s"v${k}_$i")
      Seq((2L * k, base.mkString(" ")),
        (2L * k + 1, variant.mkString(" ")))
    }.toDF("doc_id", "text")
    val truth = TrainingData.ngramExactPairs(docs, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3))).toMap
    assert(truth.keySet ==
      (0 until 30).map(k => (2L * k, 2L * k + 1)).toSet)
    truth.values.foreach { case (i, u) => assert(i == 13 && u == 23) }
    val caught = TrainingData.minhashPairsOfDocs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(truth.keySet)
    assert(caught.nonEmpty, "banding caught nothing at jac 13/23")
    assert(caught.size < truth.size, "banding missed nothing at jac " +
      "13/23 — the miss branch is untestable")
    // the gauge arithmetic on this fixture: one bucket (4), exact
    // recall from the caught count
    val c = caught.size.toLong; val n = truth.size.toLong
    assert((2 * c * 10000 + n) / (2 * n) < 10000L)
  }
}
