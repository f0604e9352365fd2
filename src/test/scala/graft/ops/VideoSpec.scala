package graft.ops

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The q154 video-modality contracts: the RIFF/AVI demux round-trips
  * the builder byte-exactly (including odd-sized frame padding), frame
  * pixel checksums match an independent decode of the same JPEG
  * payloads, sampling keeps every 2nd frame, junk blobs route to -1
  * rows, and malformed containers are rejected — mirroring AudioSpec
  * for the video modality. */
class VideoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def fixtureFrames(vid: Int, w: Int, h: Int,
                            n: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      val jb = Multimodal.jpegBytes(Multimodal.videoFrameImage(vid, f, w, h))
      if (jb.length % 2 == 0) jb :+ 0x00.toByte else jb
    }

  test("build → demux round-trips header and frame payloads byte-exactly, " +
    "through at least one odd-sized frame (the RIFF padding path)") {
    var sawOdd = false
    Multimodal.VideoFixture.foreach { case (i, w, h, n, us) =>
      val frames = fixtureFrames(i, w, h, n)
      sawOdd ||= frames.exists(_.length % 2 == 1)
      val avi = Multimodal.buildAvi(frames, w, h, us)
      val v = Multimodal.demuxAvi(avi)
        .getOrElse(fail(s"fixture AVI $i did not demux"))
      assert(v.usPerFrame == us && v.totalFrames == n)
      assert(v.width == w && v.height == h)
      assert(v.frames.length == n)
      v.frames.zip(frames).foreach { case (got, expect) =>
        assert(java.util.Arrays.equals(got, expect))
      }
    }
    assert(sawOdd, "no odd-sized frame — the padding path went untested")
  }

  test("malformed containers are rejected, not mis-parsed") {
    assert(Multimodal.demuxAvi(Array.fill[Byte](96)(0x33)).isEmpty,
      "non-RIFF bytes")
    assert(Multimodal.demuxAvi(Array.emptyByteArray).isEmpty, "empty")
    val ok = Multimodal.buildAvi(fixtureFrames(0, 16, 12, 2), 16, 12, 1000)
    assert(Multimodal.demuxAvi(ok.take(ok.length - 5)).isEmpty,
      "truncated mid-chunk must reject, not return partial frames")
    // WAVE is RIFF too — the AVI signature must still gate it
    val wav = ok.clone()
    Array[Byte]('W', 'A', 'V', 'E').copyToArray(wav, 8)
    assert(Multimodal.demuxAvi(wav).isEmpty, "RIFF but not AVI")
  }

  test("sampled frame checksums equal an independent decode of the same " +
    "payloads, and junk routes to -1 metadata rows") {
    implicit val enc: org.apache.spark.sql.Encoder[Multimodal.MediaRow] =
      Encoders.product[Multimodal.MediaRow]
    val rows = Multimodal.VideoFixture.map { case (i, w, h, n, us) =>
      Multimodal.MediaRow(i.toLong,
        Multimodal.buildAvi(fixtureFrames(i, w, h, n), w, h, us))
    } :+ Multimodal.MediaRow(99L, Array.fill[Byte](96)(0x33))
    val ds = spark.createDataset(rows)

    val meta = Multimodal.demuxAviRows(ds).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(99L).total_frames == -1 && meta(99L).n_frames == -1)
    Multimodal.VideoFixture.foreach { case (i, w, h, n, us) =>
      val m = meta(i.toLong)
      assert(m.n_frames == n && m.total_frames == n)
      assert(m.us_per_frame == us && m.width == w && m.height == h)
    }

    val sampled = Multimodal.aviFrameSample(ds, every = 2).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f).toMap
    val expectedCount = Multimodal.VideoFixture
      .map { case (_, _, _, n, _) => (n + 1) / 2 }.sum
    assert(sampled.size == expectedCount)
    Multimodal.VideoFixture.foreach { case (i, w, h, n, _) =>
      val frames = fixtureFrames(i, w, h, n)
      (0 until n).foreach { f =>
        val key = (i.toLong, f)
        if (f % 2 == 0) {
          val got = sampled.getOrElse(key, fail(s"missing frame $key"))
          val (ew, eh, ec) = Multimodal.decodeImage(frames(f))
            .getOrElse(fail(s"fixture frame $key not decodable"))
          assert(got.width == ew && got.height == eh && got.checksum == ec)
        } else assert(!sampled.contains(key), s"unsampled frame $key kept")
      }
    }
  }

  test("q154 returns one deterministic summary row") {
    val r1 = Multimodal.q154VideoPipeline(spark, "unused").collect()
    val r2 = Multimodal.q154VideoPipeline(spark, "unused").collect()
    assert(r1.length == 1 && r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    val row = r1.head
    assert(row.getAs[Long]("n_blobs") == 5L)   // 4 AVIs + 1 junk
    assert(row.getAs[Long]("n_videos") == 4L)
    assert(row.getAs[Long]("sum_frames") ==
      Multimodal.VideoFixture.map(_._4.toLong).sum)
  }
}
