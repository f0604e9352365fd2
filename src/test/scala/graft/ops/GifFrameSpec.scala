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

  test("a truncated GIF never kills the stage: at every truncation " +
    "point the demux either salvages the decodable PREFIX frames or " +
    "drops the blob — and every emitted frame is a valid PNG (the r11 " +
    "WBMP totality class; reader.read(i) can throw past the " +
    "getNumImages guard on deeper corruption)") {
    val gif = animatedGif(12, 8, colors.map(solid(12, 8, _)))
    val rows = (8 until gif.length by 7).zipWithIndex.map {
      case (len, i) => MediaRow(100L + i, java.util.Arrays.copyOf(gif, len))
    }
    // collect() itself is the no-throw assertion across all truncations
    val out = Multimodal.gifFrameSample(rows.toDS(), every = 1).collect()
    out.foreach { f =>
      assert(Multimodal.decodeImage(f.frame).isDefined,
        s"doc ${f.doc_id} emitted an undecodable frame ${f.frame_idx}")
    }
    // the intact original still demuxes fully (the guard drops nothing)
    val full = Multimodal.gifFrameSample(
      Seq(MediaRow(1L, gif)).toDS(), every = 1).collect()
    assert(full.length == colors.length)
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

  // ---- delta-coded GIFs: offsets + disposal methods --------------------

  /** Per-frame GIF metadata: placement offsets + disposal method. */
  private def gifMeta(writer: javax.imageio.ImageWriter, img: BufferedImage,
                      left: Int, top: Int, disposal: String)
      : javax.imageio.metadata.IIOMetadata = {
    val md = writer.getDefaultImageMetadata(
      javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), null)
    val fmt = "javax_imageio_gif_image_1.0"
    val tree = md.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
    def child(name: String): org.w3c.dom.Element = {
      val nodes = tree.getElementsByTagName(name)
      if (nodes.getLength > 0) nodes.item(0).asInstanceOf[org.w3c.dom.Element]
      else {
        val e = tree.getOwnerDocument.createElement(name)
        tree.appendChild(e); e
      }
    }
    val gce = child("GraphicControlExtension")
    gce.setAttribute("disposalMethod", disposal)
    gce.setAttribute("userInputFlag", "FALSE")
    gce.setAttribute("transparentColorFlag", "FALSE")
    gce.setAttribute("delayTime", "10")
    gce.setAttribute("transparentColorIndex", "0")
    val desc = child("ImageDescriptor")
    desc.setAttribute("imageLeftPosition", left.toString)
    desc.setAttribute("imageTopPosition", top.toString)
    md.setFromTree(fmt, tree)
    md
  }

  /** An animated GIF whose frames are patches placed at offsets with
    * explicit disposal methods — the delta coding most real animated
    * GIFs use. */
  private def deltaGif(frames: Seq[(BufferedImage, Int, Int, String)])
      : Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (img, l, t, d) =>
      writer.writeToSequence(
        new IIOImage(img, null, gifMeta(writer, img, l, t, d)), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** The expected composite: draw each (img, left, top) in order on a
    * transparent ARGB canvas — an independent formulation of the
    * accumulate rule. */
  private def compose(w: Int, h: Int,
                      ops: Seq[(BufferedImage, Int, Int)]): BufferedImage = {
    val c = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val g = c.createGraphics()
    try ops.foreach { case (img, l, t) => g.drawImage(img, l, t, null) }
    finally g.dispose()
    c
  }

  private def sampledChecksums(gif: Array[Byte]): Map[Int, Long] =
    Multimodal.gifFrameSample(Seq(MediaRow(5L, gif)).toDS(), every = 1)
      .collect()
      .map(f => f.frame_idx -> Multimodal.decodeImage(f.frame).get._3)
      .toMap

  test("doNotDispose delta frames composite over the accumulated canvas " +
    "at their offsets (exact pixels)") {
    val full = solid(10, 10, 0xFF0000)
    val green = solid(4, 4, 0x00FF00)
    val blue = solid(3, 3, 0x0000FF)
    val gif = deltaGif(Seq((full, 0, 0, "doNotDispose"),
      (green, 2, 3, "doNotDispose"), (blue, 5, 5, "doNotDispose")))
    val got = sampledChecksums(gif)
    assert(got(0) == Multimodal.pixelChecksum(
      compose(10, 10, Seq((full, 0, 0)))))
    assert(got(1) == Multimodal.pixelChecksum(
      compose(10, 10, Seq((full, 0, 0), (green, 2, 3)))))
    assert(got(2) == Multimodal.pixelChecksum(
      compose(10, 10, Seq((full, 0, 0), (green, 2, 3), (blue, 5, 5)))),
      "frame 2 must still carry frame 1's patch (accumulation)")
  }

  test("restoreToPrevious rolls the canvas back after the frame " +
    "(frame 2 must NOT carry frame 1's patch)") {
    val full = solid(10, 10, 0xFF0000)
    val green = solid(4, 4, 0x00FF00)
    val blue = solid(2, 2, 0x0000FF)
    val gif = deltaGif(Seq((full, 0, 0, "doNotDispose"),
      (green, 1, 1, "restoreToPrevious"), (blue, 6, 6, "doNotDispose")))
    val got = sampledChecksums(gif)
    assert(got(1) == Multimodal.pixelChecksum(
      compose(10, 10, Seq((full, 0, 0), (green, 1, 1)))),
      "frame 1 composites its patch before disposal")
    assert(got(2) == Multimodal.pixelChecksum(
      compose(10, 10, Seq((full, 0, 0), (blue, 6, 6)))),
      "frame 1's patch must be rolled back under restoreToPrevious")
  }

  test("restoreToBackgroundColor clears the frame's rect to transparent " +
    "before the next frame") {
    val full = solid(10, 10, 0xFF0000)
    val green = solid(4, 4, 0x00FF00)
    val gif = deltaGif(Seq((full, 0, 0, "restoreToBackgroundColor"),
      (green, 2, 2, "doNotDispose")))
    val got = sampledChecksums(gif)
    assert(got(0) == Multimodal.pixelChecksum(
      compose(10, 10, Seq((full, 0, 0)))))
    // frame 0's whole rect reverted: only the green patch remains,
    // everything else transparent
    assert(got(1) == Multimodal.pixelChecksum(
      compose(10, 10, Seq((green, 2, 2)))),
      "the cleared rect must be transparent, not frame 0's pixels")
  }
}
