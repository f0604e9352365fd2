package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q158 (subword-denominated sequence packing) beyond the DuckDB
  * oracle: the bin geometry against a driver-side exclusive cumsum
  * over the same [[graft.functions.Bpe]] counts, and the proof that
  * the subword denomination genuinely changes the packing vs q92.
  */
class SequencePackBpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("q158 bins are contiguous from 0, preserve doc and token " +
    "totals, and match the naive driver-side exclusive cumsum") {
    val got = TrainingData.q158BpePack(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val bins = got.keySet
    assert(bins.min == 0L && bins == (0L to bins.max).toSet)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.functions.Bpe.count(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val expect = toks.map { case (_, t) =>
        val b = cum / 2000; cum += t; (b, t)
      }.groupBy(_._1).map { case (b, xs) =>
        b -> ((xs.length.toLong, xs.map(_._2).sum))
      }
    assert(got == expect)
  }

  test("q159 manifest is consistent: per-bin rollup equals q158, slots " +
    "are contiguous in doc order, and offsets chain by token length " +
    "within a bin") {
    val man = TrainingData.q159PackManifest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val rollup = man.groupBy(_._1).map { case (b, xs) =>
      b -> ((xs.length.toLong, xs.map(_._5).sum))
    }
    val bins = TrainingData.q158BpePack(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rollup == bins)
    man.groupBy(_._1).foreach { case (b, xs) =>
      val s = xs.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1 to s.length).toSeq, s"bin $b slots")
      assert(s.map(_._3).toSeq == s.map(_._3).sorted.toSeq, s"bin $b order")
      s.sliding(2).foreach {
        case Array(a, c) =>
          assert(c._4 == a._4 + a._5, s"bin $b offset chain")
        case _ =>
      }
      assert(s.head._4 < 2000, s"bin $b head offset")
    }
  }

  test("the subword denomination is real: q158's packing differs from " +
    "q92's whitespace packing on the same corpus") {
    val ws = TrainingData.q92SequencePack(spark, dir).collect().map(_.toSeq)
    val bp = TrainingData.q158BpePack(spark, dir).collect().map(_.toSeq)
    assert(ws.toSeq != bp.toSeq)
  }
}
