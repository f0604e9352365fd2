package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Multimodal.{DecodedRow, MediaRow}

/** Binary-column decode plumbing: typed Dataset in/out, partition-wise
  * batching, deterministic stub outputs. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def media = T(spark, SparkTestBase.Sf0001, "documents")
    .select(col("doc_id"), expr("encode(text, 'utf-8')").as("bin"))
    .as[MediaRow]

  test("decode preserves rows and computes per-blob metadata") {
    val in = media
    val out = Multimodal.decode(in).collect()
    assert(out.length == in.count())
    val byId = out.map(d => d.doc_id -> d).toMap
    val sample = in.collect().take(5)
    sample.foreach { m =>
      val d = byId(m.doc_id)
      assert(d.n_bytes == m.bin.length)
      val (w, h, c) = Multimodal.decodeStub(m.bin)
      assert((d.width, d.height, d.checksum) == (w, h, c))
      assert(d.width >= 16 && d.width < 80 && d.height >= 16 && d.height < 80)
    }
  }

  test("decode is deterministic and partition-wise (no repartitioning)") {
    val ds = media.repartition(7)
    val a = Multimodal.decode(ds)
    assert(a.rdd.getNumPartitions == 7) // mapPartitions keeps partitioning
    val r1 = a.collect().sortBy(_.doc_id).toSeq
    val r2 = Multimodal.decode(ds).collect().sortBy(_.doc_id).toSeq
    assert(r1 == r2)
  }

  test("schema of the decoded Dataset is the typed contract") {
    assert(Multimodal.decode(media).schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "checksum"))
  }

  test("resize targets the requested shape and composes with decode") {
    val out = Multimodal.resize(media, 32, 32).collect()
    assert(out.length == media.count())
    out.foreach { r =>
      assert(r.width == 32 && r.height == 32)
      assert(r.bin.length <= 32 * 32 / 8 && r.bin.nonEmpty)
    }
    // blob-in/blob-out: the resized set feeds decode unchanged
    import spark.implicits._
    val resized = Multimodal.resize(media, 32, 32)
      .select(col("doc_id"), col("bin")).as[MediaRow]
    assert(Multimodal.decode(resized).count() == media.count())
  }

  test("frameSample emits every k-th fixed-size frame and drops the " +
    "truncated tail") {
    import spark.implicits._
    // 10.5 frames of 4 bytes: frames 0..9 exist, tail dropped; every=3
    // samples frames 0, 3, 6, 9
    val bin = Array.tabulate(42)(_.toByte)
    val ds = Seq(Multimodal.MediaRow(7L, bin)).toDS()
    val out = Multimodal.frameSample(ds, frameBytes = 4, every = 3)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    out.foreach { f =>
      assert(f.doc_id == 7L && f.frame.length == 4)
      assert(f.frame.toSeq ==
        (f.frame_idx * 4 until f.frame_idx * 4 + 4).map(_.toByte))
    }
  }
}
