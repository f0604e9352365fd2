package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q194 (PQ-ADC) beyond the DuckDB oracle: a driver-side brute-force
  * recomputation of the whole pipeline (quantize → codebook → codes →
  * ADC tables → top-3) on sf0.001, the PqCodes NULL contract, and the
  * approximation contract (ADC of a candidate equals the exact
  * quantized distance to its RECONSTRUCTION — the codebook entries its
  * codes name — not to the raw vector). */
class PqAdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 65536.0 + 0.5).toLong)

  private lazy val vecs: Map[Long, Array[Long]] =
    graft.ops.T(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> quant(r.getSeq[Float](1).toArray)).toMap

  /** [m][k][d] codebook from the vec_id < 16 seeds — the op's protocol. */
  private lazy val cb: Array[Array[Array[Long]]] = {
    val seeds = (0L until 16L).map(vecs)
    Array.tabulate(8)(m => Array.tabulate(16)(k =>
      Array.tabulate(8)(d => seeds(k)(m * 8 + d))))
  }

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def sub(v: Array[Long], m: Int): Array[Long] =
    v.slice(m * 8, m * 8 + 8)

  private def codesOf(v: Array[Long]): Array[Int] =
    Array.tabulate(8) { m =>
      (0 until 16).minBy(k => (d2(sub(v, m), cb(m)(k)), k))
    }

  test("q194 equals the driver-side brute force: codes, ADC sums, and " +
    "the ranked top-3 per query") {
    val queries = vecs.keys.filter(_ < TrainingData.PqQueryBatch).toSeq
    val expect = queries.flatMap { q =>
      val qv = vecs(q)
      val scored = vecs.toSeq.filter(_._1 != q).map { case (c, cv) =>
        val adc = (0 until 8).map(m =>
          d2(sub(qv, m), cb(m)(codesOf(cv)(m)))).sum
        (c, adc)
      }.sortBy { case (c, adc) => (adc, c) }.take(3)
      scored.zipWithIndex.map { case ((c, adc), i) => (q, i + 1, c, adc) }
    }.toSet
    val got = TrainingData.q194PqAdc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expect)
    assert(got.size == queries.size * 3, "short top-3 somewhere")
  }

  test("ADC is exact on reconstructions: a vector whose subvectors ARE " +
    "codebook entries scores its true quantized distance") {
    // query 0 vs candidate 3: candidate 3 is a SEED, so its codes name
    // itself (d2 to itself is 0, strictly minimal unless duplicated)
    // and ADC(0, 3) must equal the exact quantized d2(v0, v3)
    val adc = TrainingData.q194PqAdc(spark, dir) // forces cache
    val c3 = codesOf(vecs(3L))
    assert((0 until 8).forall(m => c3(m) == 3 ||
      d2(cb(m)(c3(m)), cb(m)(3)) == 0), s"seed 3 not self-coded: ${c3.toSeq}")
    val expected = d2(vecs(0L), vecs(3L))
    val viaTables = (0 until 8).map(m =>
      d2(sub(vecs(0L), m), cb(m)(c3(m)))).sum
    assert(viaTables == expected, "ADC on a reconstruction must be exact")
  }

  test("PqCodes NULL contract: short vectors and null elements code " +
    "to NULL, never a prefix code") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array.fill(64)(0.5f))),
      (2L, Some(Array.fill(63)(0.5f))), // short
      (3L, None)                        // null array
    ).toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
    val out = df.select(col("id"),
        graft.functions.PqCodes.codes(col("embedding"), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty, "short vector must code to NULL")
    assert(out(3L).isEmpty, "null vector must code to NULL")
  }
}
