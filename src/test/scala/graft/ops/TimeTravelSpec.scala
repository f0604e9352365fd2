package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q221 (time-travel read) beyond the DuckDB oracle (which recomputes
  * each version's snapshot independently from the base rules): the
  * versioned-read CONTRACT — version 2 equals the q183 latest-compaction
  * exactly, earlier versions resurrect later-deleted keys, and each
  * key's history across versions is consistent (n_ops non-decreasing,
  * price changes only at its update version). */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  private lazy val byVersion: Map[Int, Map[Long, (Long, Long)]] =
    Curation.q221TimeTravel(spark, dir).collect()
      .groupBy(_.getInt(0))
      .map { case (v, rs) =>
        v -> rs.map(r => lng(r, 1) -> ((r.getLong(2), r.getLong(3)))).toMap
      }

  test("version 2 IS the q183 latest snapshot, bit for bit") {
    val latest = Curation.q183CdcCompact(spark, dir).collect()
      .map(r => lng(r, 0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byVersion(2) == latest)
  }

  test("time travel resurrects deletes and versions are per-key " +
    "consistent") {
    val Seq(v0, v1, v2) = Seq(0, 1, 2).map(byVersion)
    // v0/v1 hold every key; v2 lacks exactly the %7 tombstones
    assert(v0.keySet == v1.keySet)
    val deleted = v0.keySet -- v2.keySet
    assert(deleted.nonEmpty && deleted.forall(_ % 7 == 0))
    assert((v2.keySet -- v0.keySet).isEmpty)
    // v0 is pristine: every key has exactly the insert
    assert(v0.values.forall(_._1 == 1L))
    // updates appear at v1 for %5 keys only, price +10.00 over v0
    v1.foreach { case (k, (nOps, price)) =>
      if (k % 5 == 0) {
        assert(nOps == 2L, k)
        assert(price == v0(k)._2 + 1000L, k)
      } else assert((nOps, price) == v0(k), k)
    }
    // surviving keys are IDENTICAL between v1 and v2 (a delete changes
    // membership, never a survivor's value)
    v2.foreach { case (k, state) => assert(state == v1(k), k) }
    // genuine mix: some updated, some not, some deleted
    assert(v1.keys.exists(_ % 5 == 0) && v1.keys.exists(_ % 5 != 0))
  }
}
