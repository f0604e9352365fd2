package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q93's coarse-quantizer training (spherical k-means): the objective
  * J = Σ(1 − cos(v, c_assigned)) must be non-increasing across Lloyd
  * iterations (assignment optimizes J given centroids; the normalized-
  * mean update optimizes it given assignments), and training must
  * actually move the seed — the r5 verdict's complaint was precisely
  * that `vec_id < 16` was a stand-in, not a trained quantizer. */
class IvfTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("Lloyd objective is non-increasing per iteration and training " +
    "moves the centroids off the seed") {
    val trained = TrainingData.trainIvfCentroids(spark,
      SparkTestBase.Sf0001)
    val (cents, objs) = (trained.cents, trained.objs)
    assert(objs.length == TrainingData.IvfIters)
    objs.sliding(2).foreach {
      case Seq(a, b) =>
        // fixed-point quantization bounds the per-step wobble at ~2^-20
        // per dimension; anything above 1e-6 is a real regression
        assert(b <= a + 1e-6, s"objective increased: $objs")
      case _ =>
    }
    assert(objs.last < objs.head,
      s"three iterations improved nothing: $objs — training is a no-op")
    // the q160 integer trace tells the same story: per-term 2^-20
    // quantization bounds step wobble at half a unit per vector
    val fx = trained.objsFx
    assert(fx.length == TrainingData.IvfIters)
    fx.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 512, s"fx objective increased: $fx")
      case _ =>
    }
    assert(fx.last < fx.head, s"fx trace improved nothing: $fx")

    val seed = graft.ops.T(spark, SparkTestBase.Sf0001, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 16)
      .orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray)
    val moved = cents.sortBy(_.cent_id).map(_.ec).zip(seed)
      .count { case (a, b) => !java.util.Arrays.equals(a, b) }
    assert(moved > 0, "no centroid moved from its seed vector")
  }

  test("iteration-1 integer objective matches an independent driver-side " +
    "fixed-point derivation (the q160 cross-engine contract)") {
    // Recompute objsFx(0) from raw floats with plain Scala arithmetic
    // speaking the r12 fixed-point metric: q_d = floor(x·2^16 + 0.5) as
    // LONG, dot and normsq as INTEGER sums (so this derivation — like
    // any oracle engine — is free to sum in any order), nrm the sqrt of
    // the exact integer, assignment by the BIGINT argmax key
    // csim_fx = floor(dot/(nrm_v·nrm_c)·2^30 + 0.5) with cent_id
    // tie-break, objective term 2^20 − floor(dot/(nrm_v·nrm_c)·2^20 +
    // 0.5). If the SQL expression tree ever drifts from this sequence,
    // the floor inputs change and this pins it.
    val rows = graft.ops.T(spark, SparkTestBase.Sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 65536.0 + 0.5).toLong)
    def idot(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var j = 0
      while (j < a.length) { acc += a(j) * b(j); j += 1 }
      acc
    }
    val qs = rows.map { case (id, v) => id -> quant(v) }.toMap
    val nrm = qs.map { case (id, q) => id -> math.sqrt(idot(q, q).toDouble) }
    // seed centroids are the quantized-float grid points whose FixDot
    // re-quantization recovers exactly these integer vectors
    val seeds = rows.filter(_._1 < 16).map(r => (r._1, qs(r._1))).sortBy(_._1)
    var expected = 0L
    for ((vid, _) <- rows) {
      val qv = qs(vid)
      val (cid, cq) = seeds.minBy { case (cid, cq) =>
        (-math.floor(idot(qv, cq).toDouble / (nrm(vid) * nrm(cid))
          * 1073741824.0 + 0.5).toLong, cid)
      }
      expected += 1048576L - math.floor(idot(qv, cq).toDouble /
        (nrm(vid) * nrm(cid)) * 1048576.0 + 0.5).toLong
    }
    val trained = TrainingData.trainIvfCentroids(spark, SparkTestBase.Sf0001)
    assert(trained.objsFx.head == expected,
      s"fx objective diverged from the pinned derivation: " +
        s"${trained.objsFx.head} vs $expected")
  }

  test("training is deterministic: two runs produce bit-identical " +
    "centroids") {
    val a = TrainingData.trainIvfCentroids(spark, SparkTestBase.Sf0001).cents
    val b = TrainingData.trainIvfCentroids(spark, SparkTestBase.Sf0001).cents
    a.sortBy(_.cent_id).zip(b.sortBy(_.cent_id)).foreach {
      case (x, y) =>
        assert(x.cent_id == y.cent_id)
        assert(java.util.Arrays.equals(x.ec, y.ec),
          s"centroid ${x.cent_id} differs between runs")
    }
  }
}
