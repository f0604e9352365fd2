package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The audio modality, pinned exactly: JDK `javax.sound.sampled` decode
  * must report true rates/channels/frame counts and a checksum of the
  * normalized PCM equal to one computed directly on the synthesized
  * samples; junk routes to the -1 fallback row; resampling halves the
  * frame count (±1 for converter edge handling), re-decodes at the
  * target rate, and is deterministic. Plus the q116 driver-visible row.
  */
class AudioSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** A deterministic 16-bit LE signed WAV plus its raw PCM payload. */
  private def sineWav(rate: Int, channels: Int,
                      frames: Int): (Array[Byte], Array[Byte]) = {
    val pcm = new Array[Byte](frames * 2 * channels)
    for (f <- 0 until frames; c <- 0 until channels) {
      val s = (math.sin(2 * math.Pi * (330 + 55 * c) * f / rate) * 11000)
        .toInt.toShort
      pcm(2 * (f * channels + c)) = (s & 0xff).toByte
      pcm(2 * (f * channels + c) + 1) = (s >> 8).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    (bos.toByteArray, pcm)
  }

  test("decodeAudio reports exact rate/channels/frames and a checksum " +
    "equal to one computed directly on the synthesized PCM") {
    val (wav, pcm) = sineWav(8000, 1, 4800)
    val Some((rate, ch, frames, chk)) = Multimodal.decodeAudio(wav)
    assert((rate, ch, frames) == (8000, 1, 4800L))
    // the source IS 16-bit LE signed, so normalization is the identity
    // and the waveform checksum must equal the raw-PCM checksum
    assert(chk == Multimodal.byteChecksum(pcm))
  }

  test("stereo decode keeps the channel count and the per-frame layout") {
    val (wav, pcm) = sineWav(12000, 2, 3000)
    val Some((rate, ch, frames, chk)) = Multimodal.decodeAudio(wav)
    assert((rate, ch, frames) == (12000, 2, 3000L))
    assert(chk == Multimodal.byteChecksum(pcm))
  }

  test("non-audio bytes decode to None, and decodeAudioRows keeps their " +
    "row with -1 markers and the byte fallback checksum") {
    val junk = Array.fill[Byte](64)(0x2a)
    assert(Multimodal.decodeAudio(junk).isEmpty)
    import spark.implicits._
    val rows = Multimodal.decodeAudioRows(
      Seq(Multimodal.MediaRow(7L, junk)).toDS()).collect()
    assert(rows.toSeq == Seq(Multimodal.AudioRow(7L, 64, -1, -1, -1L, -1L,
      Multimodal.byteChecksum(junk))))
  }

  test("resampleWav halves the frame count at half the rate, re-decodes " +
    "at the target rate, and is deterministic") {
    val (wav, _) = sineWav(8000, 1, 4800)
    val Some(half) = Multimodal.resampleWav(wav, 4000)
    val Some((rate, ch, frames, chk)) = Multimodal.decodeAudio(half)
    assert(rate == 4000 && ch == 1)
    assert(math.abs(frames - 2400L) <= 1,
      s"8000→4000 Hz must halve 4800 frames, got $frames")
    val Some(again) = Multimodal.resampleWav(wav, 4000)
    assert(java.util.Arrays.equals(half, again), "resample must be " +
      "deterministic (same bytes, same converter, same output)")
    assert(Multimodal.decodeAudio(again).get._4 == chk)
  }

  test("resampleAudio's Dataset path carries the true frame count for " +
    "stereo too (no mono header guess)") {
    import spark.implicits._
    val (wav, _) = sineWav(12000, 2, 3000)
    val out = Multimodal.resampleAudio(
      Seq(Multimodal.MediaRow(3L, wav)).toDS(), 6000).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.sample_rate == 6000)
    val Some((rate, ch, frames, _)) = Multimodal.decodeAudio(r.bin)
    assert(rate == 6000 && ch == 2)
    assert(r.frames == frames, "row frame count must match the blob")
    assert(math.abs(frames - 1500L) <= 1)
  }

  test("q116 summarizes the fixture chain: 9 blobs, 8 decoded, junk " +
    "routed, resample covered") {
    val row = graft.SparkEntry.queries("q116_audio_pipeline")(
      spark, SparkTestBase.Sf0001).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getAs[Long]("n_blobs") == 9L)
    assert(r.getAs[Long]("n_audio") == 8L)
    // sum of the 8 fixture frame counts: 2000 + 2500 + ... + 5500
    assert(r.getAs[Long]("sum_frames") == (0 until 8).map(2000 + 500 * _).sum)
    assert(r.getAs[Long]("n_distinct") == 9L,
      "8 waveforms + 1 junk byte-fingerprint must all be distinct")
    assert(r.getAs[Long]("resampled_rates") == 1L, "one target rate")
    assert(r.getAs[Long]("resampled_frames") > 0L)
  }
}
