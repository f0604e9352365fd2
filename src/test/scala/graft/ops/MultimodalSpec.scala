package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Multimodal.MediaRow

/** Binary-column decode path with REAL JDK ImageIO codecs: typed Dataset
  * in/out, partition-wise batching, exact pixel dimensions, format-
  * independent content checksums, and the non-image fallback routing. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Deterministic w×h test image (opaque sRGB pixels from a seed). */
  private def image(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (seed * 2654435761L + x * 7 + y * 131).toInt & 0xFFFFFF)
    img
  }

  private def encodeBytes(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  /** 6 PNGs with distinct, id-derived dimensions. */
  private def media = (0 until 6).map { i =>
    MediaRow(i.toLong, encodeBytes(image(16 + 4 * i, 12 + 3 * i, i), "png"))
  }.toDS()

  test("decode reads real pixel dimensions and content checksums") {
    val out = Multimodal.decode(media).collect().sortBy(_.doc_id)
    assert(out.length == 6)
    out.foreach { d =>
      val i = d.doc_id.toInt
      assert((d.width, d.height) == ((16 + 4 * i, 12 + 3 * i)),
        s"doc $i: ImageIO must report the true encoded dimensions")
      val bytes = encodeBytes(image(16 + 4 * i, 12 + 3 * i, i), "png")
      assert(d.n_bytes == bytes.length)
      assert(d.checksum == Multimodal.decodeImage(bytes).get._3)
    }
  }

  test("checksum is pixel-content-based: PNG and BMP of the same image " +
    "hash equal, different pixels do not") {
    val img = image(20, 10, 42)
    val Some((pw, ph, pc)) = Multimodal.decodeImage(encodeBytes(img, "png"))
    val Some((bw, bh, bc)) = Multimodal.decodeImage(encodeBytes(img, "bmp"))
    assert((pw, ph) == ((20, 10)) && (bw, bh) == ((20, 10)))
    assert(pc == bc, "same pixels, different container must hash equal")
    val other = Multimodal.decodeImage(
      encodeBytes(image(20, 10, 43), "png")).get._3
    assert(other != pc, "different pixels must hash differently")
  }

  test("non-image blobs keep their row with the fallback fingerprint") {
    val blob = "definitely not an image".getBytes("UTF-8")
    val mixed = (media.collect().toSeq :+ MediaRow(99L, blob)).toDS()
    val out = Multimodal.decode(mixed).collect()
    assert(out.length == 7, "decode is total: corrupt blobs stay queryable")
    val bad = out.find(_.doc_id == 99L).get
    assert(bad.width == -1 && bad.height == -1)
    assert(bad.checksum == Multimodal.byteChecksum(blob))
    assert(bad.n_bytes == blob.length)
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

  test("resize really rescales: decode of the output reports the target " +
    "shape, and non-decodable blobs are dropped") {
    val blob = MediaRow(99L, "not an image".getBytes("UTF-8"))
    val mixed = (media.collect().toSeq :+ blob).toDS()
    val resized = Multimodal.resize(mixed, 32, 24)
    val rows = resized.collect()
    assert(rows.length == 6, "the non-image blob is filtered, images kept")
    rows.foreach(r => assert(r.width == 32 && r.height == 24))
    // blob-in/blob-out: the resized PNGs re-enter decode and report the
    // target dimensions — proof the pixels were actually rescaled and
    // re-encoded, not just relabeled
    val redecoded = Multimodal.decode(
      resized.select(col("doc_id"), col("bin")).as[MediaRow]).collect()
    assert(redecoded.length == 6)
    redecoded.foreach(d => assert((d.width, d.height) == ((32, 24))))
  }

  test("resize is deterministic in its inputs") {
    val a = Multimodal.resize(media, 8, 8).collect().sortBy(_.doc_id)
    val b = Multimodal.resize(media, 8, 8).collect().sortBy(_.doc_id)
    (a zip b).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x.bin, y.bin))
    }
  }

  test("frameSample emits every k-th fixed-size frame and drops the " +
    "truncated tail") {
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
