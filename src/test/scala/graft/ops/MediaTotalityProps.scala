package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** Totality of every binary media entry point over arbitrary bytes —
  * the r11 WBMP lesson (`ImageIO.read` THROWS on a truncated blob whose
  * first two bytes happen to be 0x00 0x00) generalized: at 100 TB a
  * decode stage WILL see every possible byte string, and "returns
  * None / keeps the corrupt-blob row" is only a contract if it holds
  * for adversarial prefixes too. Random bytes, plus bytes that START
  * like each container and then lie about their length. */
object MediaTotalityProps extends Properties("MediaTotality") {

  private val raw: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  /** A valid-looking container magic followed by arbitrary garbage —
    * the prefix-collision shape that broke ImageIO. */
  private def prefixed(magic: Array[Byte]): Gen[Array[Byte]] =
    raw.map(tail => magic ++ tail)

  private val riffAvi: Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](-1, -1, -1, 127) ++
      "AVI ".getBytes("US-ASCII")
  private val wavHdr: Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](-1, -1, -1, 127) ++
      "WAVE".getBytes("US-ASCII")
  private val wbmp: Array[Byte] = Array[Byte](0, 0)

  private def total[A](f: Array[Byte] => Option[A]): Gen[Array[Byte]] => Prop =
    gen => Prop.forAll(gen) { bytes =>
      f(bytes) // any Option is fine; a throw fails the property
      true
    }

  property("decodeImage never throws (raw / WBMP-prefixed)") =
    total(Multimodal.decodeImage)(raw) &&
      total(Multimodal.decodeImage)(prefixed(wbmp))

  property("dhash64 never throws (raw / WBMP-prefixed)") =
    total(Multimodal.dhash64)(raw) &&
      total(Multimodal.dhash64)(prefixed(wbmp))

  property("resizeImage never throws (raw / WBMP-prefixed)") =
    total(Multimodal.resizeImage(_, 8, 8))(raw) &&
      total(Multimodal.resizeImage(_, 8, 8))(prefixed(wbmp))

  property("decodeAudio never throws (raw / lying WAV header)") =
    total(Multimodal.decodeAudio)(raw) &&
      total(Multimodal.decodeAudio)(prefixed(wavHdr))

  property("demuxAvi never throws (raw / lying RIFF-AVI header)") =
    total(Multimodal.demuxAvi)(raw) &&
      total(Multimodal.demuxAvi)(prefixed(riffAvi))

  property("demuxAvi survives the Int-overflow chunk size (crafted " +
    "blob — `body + size` wraps negative past an Int-only bound check; " +
    "random generation cannot hit this 4-byte window)") = Prop.secure {
    val blob = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 127) ++ "AVI ".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++
      Array[Byte](-16, -1, -1, 127) ++ // size = 2147483632
      Array[Byte](1, 2, 3, 4)
    Multimodal.demuxAvi(blob).isEmpty // truncated, not thrown
  }

  property("demuxAvi survives deeply nested LIST chunks (crafted blob " +
    "— unbounded recursion would StackOverflowError, a FATAL error no " +
    "NonFatal catch absorbs; random generation cannot nest LISTs)") =
    Prop.secure {
      val depth = 10000
      val innerSize = 8 // one terminal 0-byte chunk + padding room
      // build inside-out: each level wraps the previous in LIST(size)
      val sizes = Iterator.iterate(innerSize)(_ + 12).take(depth).toSeq
      val buf = java.nio.ByteBuffer
        .allocate(12 + sizes.last + 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
      buf.putInt(sizes.last + 12 + 4)
      buf.put("AVI ".getBytes("US-ASCII"))
      sizes.reverse.foreach { sz =>
        buf.put("LIST".getBytes("US-ASCII"))
        buf.putInt(sz)
        buf.put("recx".getBytes("US-ASCII")) // list type (4 of sz)
      }
      Multimodal.demuxAvi(buf.array()).isEmpty // depth-capped, not thrown
    }
}
