package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q182 perceptual near-dup: the dHash bit definition hand-pinned on
  * crafted pixel grids, rendition behavior (identical hash under a
  * linear brightness remap, tiny distance under rescale, far distance
  * across pictures), and the banding recall guarantee versus brute
  * force. */
class ImageNeardupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def png(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray(x, y).max(0).min(255)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash bit definition: increasing rows = all ones, decreasing " +
    "= zero, single-pixel cells hand-verified") {
    // 9×8: each cell is exactly one pixel — the defining case
    val inc = Multimodal.dhash64(png(9, 8, (x, _) => x * 20)).get
    assert(inc == -1L) // all 64 gradient bits set
    val dec = Multimodal.dhash64(png(9, 8, (x, _) => 255 - x * 20)).get
    assert(dec == 0L)
    // one flipped column: only that column's bits differ
    val oneDip = Multimodal.dhash64(
      png(9, 8, (x, _) => if (x == 5) 0 else x * 20)).get
    val diff = java.lang.Long.bitCount(inc ^ oneDip)
    assert(diff > 0 && diff <= 16, s"diff=$diff")
  }

  test("undecodable and sub-grid blobs hash to None") {
    assert(Multimodal.dhash64("not an image".getBytes).isEmpty)
    assert(Multimodal.dhash64(png(4, 4, (_, _) => 7)).isEmpty)
  }

  test("a truncated WBMP-prefixed blob decodes to None in EVERY image " +
    "entry point — the JRE's WBMP reader claims a 0x00 0x00 prefix and " +
    "then throws EOFException (ImageProps seed cRKODXY4…, r11)") {
    val wbmpish = Array[Byte](0, 0, 1, 1)
    assert(Multimodal.dhash64(wbmpish).isEmpty)
    assert(Multimodal.decodeImage(wbmpish).isEmpty)
    assert(Multimodal.resizeImage(wbmpish, 8, 8).isEmpty)
  }

  test("renditions: linear remap identical, rescale near, cross far") {
    def field(u: Double, v: Double): Int =
      (127.5 * (1 + math.sin(2 * math.Pi * (2 * u + v)))).toInt.min(255)
    val base = Multimodal.dhash64(png(64, 48,
      (x, y) => field(x / 63.0, y / 47.0))).get
    val remap = Multimodal.dhash64(png(64, 48,
      (x, y) => field(x / 63.0, y / 47.0) / 2 + 64)).get
    assert(base == remap)
    val small = Multimodal.dhash64(png(32, 24,
      (x, y) => field(x / 31.0, y / 23.0))).get
    assert(java.lang.Long.bitCount(base ^ small) <= 7)
    def other(u: Double, v: Double): Int =
      (127.5 * (1 + math.sin(2 * math.Pi * (u + 2 * v)))).toInt.min(255)
    val far = Multimodal.dhash64(png(64, 48,
      (x, y) => other(x / 63.0, y / 47.0))).get
    assert(java.lang.Long.bitCount(base ^ far) > 10)
  }

  test("q182: every rendition pair found, no cross-picture pair, and " +
    "banding recalls everything brute force finds at the full threshold") {
    val got = Multimodal.q182ImageNeardup(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    // renditions of one base differ only in the tens digit
    got.foreach { case (a, b, d) =>
      assert(a / 10 == b / 10, s"cross-picture pair ($a,$b) dist=$d")
    }
    val found = got.map(p => (p._1, p._2)).toSet
    (0 until 6).foreach { b =>
      assert(found.contains((b * 10L, b * 10L + 1)), s"base $b remap")
      assert(found.contains((b * 10L, b * 10L + 2)), s"base $b rescale")
      assert(found.contains((b * 10L + 1, b * 10L + 2)), s"base $b pair")
    }
    // brute-force recall at the FULL shipped threshold: any pair within
    // NeardupMaxHamming bits shares one of the 11 bands (pigeonhole)
    // and must be in the output — r10's 8×8 banding only guaranteed ≤7
    for (a <- hashes.keys; b <- hashes.keys if a < b) {
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if (d <= Multimodal.NeardupMaxHamming)
        assert(found.contains((a, b)), s"missed ($a,$b) d=$d")
    }
  }

  private lazy val hashes: Map[Long, Long] =
    (0 until 6).flatMap(b => Seq(b * 10, b * 10 + 1, b * 10 + 2))
      .map { id =>
        val p = java.nio.file.Paths.get(
          Multimodal.neardupFixtureDir, s"pic_$id.png")
        id.toLong -> Multimodal.dhash64(java.nio.file.Files.readAllBytes(p)).get
      }.toMap

  test("banding is pigeonhole-exact at the shipped threshold: adversarial " +
    "hashes at distances 8, 9, 10 are all recalled; 11 is excluded") {
    import spark.implicits._
    // Base hash 0, then flip the LOWEST d bits — the worst case for the
    // band layout, since low bits pack densely into the 6-bit bands
    // (d=10 touches exactly ceil(10/6)=2 of the first bands; the
    // guarantee must come from the OTHER 9 bands matching).
    def flipLow(d: Int): Long = (1L << d) - 1
    // And flip d bits SPREAD one per band (touches min(d,11) distinct
    // bands — the case that defeated the 8-band layout at d in 8..10).
    val bandStarts = (0 until 9).map(_ * 6L) ++ Seq(54L, 59L)
    def flipSpread(d: Int): Long =
      bandStarts.take(d).map(s => 1L << s.toInt).reduce(_ | _)
    val rows = Seq(
      0L -> 0L,
      1L -> flipLow(8), 2L -> flipLow(9), 3L -> flipLow(10),
      4L -> flipSpread(8), 5L -> flipSpread(9), 6L -> flipSpread(10),
      7L -> flipSpread(11) // beyond threshold — must NOT pair with 0
    )
    val got = Multimodal.bandedHammingPairs(rows.toDF("doc_id", "h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val withBase = got.filter(_._1 == 0L).map(p => (p._2, p._3)).toMap
    (1L to 6L).foreach { id =>
      assert(withBase.contains(id), s"banding missed doc $id vs base " +
        s"(d=${java.lang.Long.bitCount(rows.toMap.apply(id))})")
    }
    assert(!withBase.contains(7L), "distance-11 pair must be filtered")
    // distances reported are the exact bit_count of the xor
    assert(withBase(3L) == 10 && withBase(6L) == 10)
  }
}
