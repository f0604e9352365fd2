package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property suite for the real codec path (no Spark needed — the
  * per-blob functions are pure): PNG is lossless, so decode∘encode must
  * round-trip EXACT dimensions and pixel checksums for arbitrary images;
  * resize must re-encode to exactly the requested shape; and the pixel
  * checksum must be an image-content function — equal across container
  * formats, sensitive to any single-pixel change. */
object ImageProps extends Properties("ImageCodecs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val dim = Gen.chooseNum(1, 48)

  /** Arbitrary opaque-RGB image: dimensions and a pixel seed. */
  private val image: Gen[BufferedImage] = for {
    w <- dim; h <- dim; seed <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
  } yield {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var s = seed
    for (y <- 0 until h; x <- 0 until w) {
      s = s * 1103515245 + 12345 // deterministic LCG pixels
      img.setRGB(x, y, s & 0xFFFFFF)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  property("PNG encode->decode round-trips exact dimensions and pixels") =
    Prop.forAll(image) { img =>
      Multimodal.decodeImage(png(img)) match {
        case Some((w, h, c)) =>
          w == img.getWidth && h == img.getHeight &&
            c == Multimodal.pixelChecksum(img)
        case None => false
      }
    }

  property("checksum is container-independent (PNG == BMP)") =
    Prop.forAll(image) { img =>
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "bmp", bos)
      Multimodal.decodeImage(png(img)).map(_._3) ==
        Multimodal.decodeImage(bos.toByteArray).map(_._3)
    }

  property("checksum is pixel-sensitive: flipping one pixel changes it") =
    Prop.forAll(image, Gen.chooseNum(0, 1 << 20)) { (img, r) =>
      val x = r % img.getWidth
      val y = (r / img.getWidth) % img.getHeight
      val before = Multimodal.pixelChecksum(img)
      img.setRGB(x, y, img.getRGB(x, y) ^ 0x010101)
      before != Multimodal.pixelChecksum(img)
    }

  property("resize re-encodes to exactly the requested shape") =
    Prop.forAll(image, dim, dim) { (img, w, h) =>
      Multimodal.resizeImage(png(img), w, h)
        .flatMap(Multimodal.decodeImage) match {
        case Some((rw, rh, _)) => rw == w && rh == h
        case None => false
      }
    }

  property("non-image bytes decode to None, never throw") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue,
      Byte.MaxValue))) { bytes =>
      // exclude byte strings that begin with a real magic number — a
      // random prefix collision with PNG/GIF/BMP/JPEG is astronomically
      // unlikely but would be a correct Some
      val arr = bytes.toArray
      Multimodal.decodeImage(arr) match {
        case None => true
        case Some((w, h, _)) => w > 0 && h > 0 // if it decodes, sanely
      }
    }
}
