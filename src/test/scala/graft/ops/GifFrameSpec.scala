package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Multimodal.MediaRow

/** Real GIF container demuxing: animated GIFs written with the JDK's
  * own sequence writer round-trip through [[Multimodal.gifFrameSample]]
  * — every k-th frame comes back as a standalone PNG with the exact
  * frame pixels. */
class GifFrameSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // palette-exact solid colors: GIF's 256-color quantization cannot
  // perturb a frame that uses a single exact RGB value
  private val colors =
    Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00, 0x00FFFF, 0xFF00FF)

  private def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  private def animatedGif(w: Int, h: Int, frames: Seq[BufferedImage])
      : Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("every k-th GIF frame demuxes to a PNG with exact pixels; " +
    "non-GIF blobs are dropped") {
    val gif = animatedGif(12, 8, colors.map(solid(12, 8, _)))
    val ds = Seq(
      MediaRow(1L, gif),
      MediaRow(99L, "not a gif at all".getBytes("UTF-8"))).toDS()
    val out = Multimodal.gifFrameSample(ds, every = 2)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.doc_id).distinct.toSeq == Seq(1L),
      "non-GIF blob must yield no frames")
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    out.foreach { f =>
      val Some((w, h, checksum)) = Multimodal.decodeImage(f.frame)
      assert((w, h) == ((12, 8)), s"frame ${f.frame_idx} dimensions")
      val want = Multimodal.pixelChecksum(solid(12, 8, colors(f.frame_idx)))
      assert(checksum == want,
        s"frame ${f.frame_idx} pixels corrupted in the demux")
    }
  }

  test("demux is a narrow stage and every=1 returns all frames") {
    val gif = animatedGif(6, 6, colors.take(4).map(solid(6, 6, _)))
    val ds = Seq(MediaRow(7L, gif)).toDS().repartition(3)
    val frames = Multimodal.gifFrameSample(ds, every = 1)
    assert(frames.rdd.getNumPartitions == 3)
    assert(frames.collect().map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
  }
}
