package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q213 (ANN recall diagnostic) beyond the DuckDB oracle (which reruns
  * both rankings): the EXACT side recomputed driver-side with
  * independent integer math (BigInt dots over the 2¹⁶ quantization —
  * no FixDot, no Spark expressions), the hit counts re-derived from the
  * probe's own output, and the property that the diagnostic can
  * actually report degradation (a miss exists at sf0.01 — a gauge
  * pinned at 100% would be untrustworthy). */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def q(x: Float): Long =
    math.floor(x.toDouble * 65536.0 + 0.5).toLong

  /** Independent exact top-3 per query over the raw embeddings. */
  private def exactTop3(dir: String): Map[Long, Set[Long]] = {
    val vs = T(spark, dir, "embeddings").select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(q))
    // integer sum of squares first, ONE toDouble, then sqrt — the
    // fxSim convention
    val normB = vs.map { case (id, a) =>
      id -> math.sqrt(a.map(x => BigInt(x) * BigInt(x)).sum.toDouble)
    }.toMap
    vs.filter(_._1 < 8).map { case (qid, qa) =>
      qid -> vs.filter(_._1 != qid).map { case (cid, ca) =>
        val dot = qa.zip(ca).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
        (cid, dot.toDouble / (normB(qid) * normB(cid)))
      }.sortBy { case (cid, sim) => (-sim, cid) }.take(3).map(_._1).toSet
    }.toMap
  }

  test("q213 hit counts equal |probe ∩ independent exact top-3| per " +
    "query (exact side fully independent; probe side is the index's " +
    "own output, itself brute-forced by IndexedAnnSpec)") {
    val dir = SparkTestBase.Sf0001
    val exact = exactTop3(dir)
    val (cents, cellsT) = TrainingData.ensureIvfIndex(spark, dir)
    val batch = spark.table(cellsT).filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"), col("nrm"))
    val probe = TrainingData.probeIvfIndex(spark, cents, cellsT, batch)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

    val got = TrainingData.q213AnnRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (0L until 8L).toSeq)
    got.foreach { case (qid, nHit, recall) =>
      val expHit = (probe.getOrElse(qid, Set.empty) & exact(qid)).size.toLong
      assert(nHit == expHit, s"q$qid: got $nHit exp $expHit")
      assert(exact(qid).size == 3, s"q$qid exact set degenerate")
      assert(recall ==
        ((2 * nHit * 10000 + 3) / 6).toDouble / 10000.0, s"q$qid r4")
    }
  }

  test("the miss branch is real at sf0.01: some query's probe drops an " +
    "exact neighbor (recall < 1) while others stay perfect") {
    val got = TrainingData.q213AnnRecall(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(1))
    assert(got.exists(_ < 3L), "all queries perfect — gauge untested")
    assert(got.exists(_ == 3L), "all queries missing — index broken")
  }
}
