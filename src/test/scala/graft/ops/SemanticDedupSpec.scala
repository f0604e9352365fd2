package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q156 (semantic dedup) and q157 (hard-negative mining) beyond the
  * DuckDB oracle: brute-force recomputation from the ranked assignment
  * (driver-side, sf0.001's 500 vectors) plus the structural contracts
  * — drop rule, keeper minimality, label-mismatch, rank geometry.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  /** The IVF family's r12 rerank cosine numerator: the 2¹⁶ fixed-point
    * integer dot (FixDot's arithmetic), NOT a double fold — the specs'
    * brute force must speak the same metric as the op. */
  private def fxdot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0L; var i = 0
    while (i < a.length) {
      s += math.floor(a(i).toDouble * 65536.0 + 0.5).toLong *
        math.floor(b(i).toDouble * 65536.0 + 0.5).toLong
      i += 1
    }
    s.toDouble
  }

  /** (vec_id, embedding, nrm, cell, label) rows of the arn=1 slice. */
  private lazy val cellRows = TrainingData.ivfAssign(spark, dir, 1)
    .collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2),
      r.getInt(3), r.getInt(5)))

  test("q156 equals brute-force within-cell pairs at the 0.40 floor, " +
    "with the smallest qualifying id as keeper") {
    val byCell = cellRows.groupBy(_._4)
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    for ((_, vs) <- byCell; a <- vs; b <- vs if a._1 < b._1) {
      val sim = fxdot(a._2, b._2) / (a._3 * b._3)
      if (sim >= 0.40) {
        val cur = expect.get(b._1)
        if (cur.isEmpty || a._1 < cur.get._1) expect(b._1) = (a._1, sim)
      }
    }
    val got = TrainingData.q156SemanticDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.nonEmpty, "degenerate fixture: no semantic dups at 0.40")
    assert(got.keySet == expect.keySet)
    got.foreach { case (dropped, (keeper, sim)) =>
      val (ek, es) = expect(dropped)
      assert(keeper == ek && keeper < dropped, s"dropped $dropped")
      assert(sim == math.rint(es * 10000) / 10000 ||
        (sim - es).abs < 5e-5, s"sim drift on $dropped: $sim vs $es")
    }
  }

  test("q157 equals brute-force hard negatives over the probed cells " +
    "and never returns the query's own label") {
    val probe = TrainingData.ivfAssign(spark, dir, 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2),
        r.getInt(3), r.getInt(4), r.getInt(5)))
    val cells = probe.filter(_._5 == 1)
    val labelOf = cells.map(r => r._1 -> r._6).toMap
    val expect: Map[(Long, Int), (Long, Int, Double)] =
      probe.filter(r => r._1 % 50 == 0)
        .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
          val ql = labelOf(qid)
          val probed = rows.map(_._4).toSet
          val cands = cells
            .filter(c => probed.contains(c._4) && c._6 != ql)
            .map(c => (c._1, c._6,
              fxdot(rows.head._2, c._2) / (rows.head._3 * c._3)))
            .sortBy(c => (-c._3, c._1)).take(3)
          cands.zipWithIndex.map { case ((cid, lbl, sim), i) =>
            (qid, i + 1) -> ((cid, lbl, sim))
          }
        }.toMap
    val got = TrainingData.q157HardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(4)) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    assert(got.keySet == expect.keySet)
    got.foreach { case (k @ (qid, _), (cid, lbl, sim)) =>
      val (ecid, elbl, esim) = expect(k)
      assert(cid == ecid && lbl == elbl, s"at $k")
      assert(lbl != labelOf(qid), s"own-label negative at $k")
      assert((sim - esim).abs < 5e-5, s"sim drift at $k")
    }
  }
}
