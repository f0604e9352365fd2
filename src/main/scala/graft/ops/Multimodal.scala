package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_extract}

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is modeled as an opaque `binary` column plus typed metadata —
  * the layout a 100 TB training-data pipeline uses (content-addressed
  * blobs co-partitioned with their metadata). The decode/feature-extract
  * stage runs partition-wise over a typed `Dataset` (`mapPartitions`: one
  * iterator per partition, so codec init amortizes per partition, not
  * per row).
  *
  * Image decode and resize are REAL: the JDK's bundled ImageIO codecs
  * (PNG/BMP/GIF/JPEG — no external dependency) read actual pixel
  * dimensions and re-encode scaled output. Audio decode and resample
  * are REAL too (r7): the JDK's `javax.sound.sampled` readers
  * (WAV/AIFF/AU) and format-conversion providers give true sample
  * rates, channel counts, frame counts, normalized-PCM checksums, and
  * rate conversion — [[decodeAudio]]/[[resampleAudio]], the audio
  * siblings of [[decodeImage]]/[[resize]]. Blobs that are not decodable
  * take a documented fallback (byte-level fingerprint in [[decode]] /
  * [[decodeAudioRows]]; dropped by [[resize]]/[[resampleAudio]]) — the
  * decode-failure routing every real media pipeline needs, since a
  * 100 TB blob store always contains some corrupt or mislabeled files.
  * Container demuxing is real for the one animated format the JDK reads
  * ([[gifFrameSample]]: per-frame GIF extraction via `ImageReader`);
  * [[frameSample]] keeps the fixed-size-frame model for raw frame
  * streams — the every-k-th-frame contract is the same in both. Real
  * VIDEO container demux (r10) is [[demuxAvi]]: a pure-JDK RIFF chunk
  * walk over MJPEG-in-AVI — the one video container whose payload the
  * JDK's own codecs decode — completing the image → animation → audio
  * → video modality story ([[aviFrameSample]] / [[demuxAviRows]] /
  * q154).
  */
object Multimodal {

  /** Input: opaque media blob keyed by document. */
  final case class MediaRow(doc_id: Long, bin: Array[Byte])

  /** Ingests on-disk media blobs through Spark's `binaryFile` source —
    * the real read path in front of [[decode]]/[[resize]]/[[frameSample]]
    * (MultimodalIngestSpec drives the whole chain end to end). Files are
    * expected to follow the content-addressed `<anything><id>.<ext>`
    * convention — the trailing numeric id keys the blob to its metadata
    * row, and MUST be unique across the ingested tree: `a_7.png` and
    * `b7.png` both map to doc_id 7 and will surface as duplicate keys
    * downstream (pinned in MultimodalIngestSpec; screen with a
    * count-distinct check if the naming discipline is not guaranteed).
    * Glob-matched files WITHOUT a trailing numeric id are filtered out
    * before the cast — under ANSI mode (Spark 4 default) casting the
    * empty extract would otherwise abort the whole scan with
    * CAST_INVALID_INPUT on the first such file. The source splits the
    * listing across tasks, so a million blobs parallelize like any other
    * table scan. `binaryFile` reads each whole file as one `content`
    * cell — the right model for media blobs (bounded per-file size), not
    * for multi-GB archives, which would want a custom DSv2 source with
    * range reads. */
  def readBlobs(spark: SparkSession, path: String,
                pattern: String = "*.bin"): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    val idRe = "(\\d+)\\.[A-Za-z0-9]+$"
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern)
      .load(path)
      .select(regexp_extract(col("path"), idRe, 1).as("id_str"),
        col("content").as("bin"))
      .where(col("id_str") =!= "") // ANSI-safe: skip digit-less names
      .select(col("id_str").cast("long").as("doc_id"), col("bin"))
      .as[MediaRow]
  }

  /** Output: extracted features/metadata per blob. `width`/`height` are
    * the real pixel dimensions for decodable images and -1 for blobs the
    * codecs reject; `checksum` is pixel-content-based for images (format
    * independent) and byte-based for the rest. */
  final case class DecodedRow(doc_id: Long, n_bytes: Int, width: Int,
                              height: Int, checksum: Long)

  /** Polynomial fingerprint of raw bytes — the fallback identity for
    * blobs that are not decodable images. */
  def byteChecksum(bytes: Array[Byte]): Long =
    bytes.foldLeft(1125899906842597L)((a, b) => 31 * a + b)

  /** Polynomial fingerprint of the decoded ARGB pixel grid (`getRGB`
    * converts every source color model to default-sRGB ARGB, so a PNG
    * and a BMP of the same pixels hash equal — a content hash of the
    * image, not of its encoding). */
  def pixelChecksum(img: BufferedImage): Long = {
    var acc = 1125899906842597L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        acc = 31 * acc + img.getRGB(x, y)
        x += 1
      }
      y += 1
    }
    acc
  }

  /** `ImageIO.read` under the library's TOTALITY contract: the JRE's
    * readers mostly return null for unrecognized bytes, but some —
    * WBMP notably, whose "magic" is just a 0x00 0x00 prefix — claim
    * the stream and then THROW (`EOFException`) when the payload is
    * truncated. Found by ImageProps' random-bytes property (r11, seed
    * cRKODXY4…): without this catch, ONE corrupt 4-byte blob shaped
    * like a WBMP header kills the whole 100 TB decode stage instead of
    * routing to the corrupt-blob row. IO and image-format errors are
    * data, not crashes. */
  private def readImageTotal(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch {
      // NonFatal, not just IOException: the JDK's plugin readers are
      // known to throw unchecked exceptions (IndexOutOfBounds,
      // NegativeArraySize, IllegalArgument) on adversarial headers
      // with a valid magic — all of them are corrupt-blob data here
      case scala.util.control.NonFatal(_) => None
    }

  /** Real image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG readers
    * ship with the JRE). Returns (width, height, pixel checksum), or
    * None when the bytes are not a decodable image. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    readImageTotal(bytes)
      .map(img => (img.getWidth, img.getHeight, pixelChecksum(img)))

  /** Partition-wise decode: real ImageIO decode per row, iterator-in/
    * iterator-out so per-partition setup (here: disabling ImageIO's
    * temp-file cache, which would otherwise hit local disk on every
    * decode) happens once. Non-image blobs keep their row — width/height
    * -1 and a byte-level fingerprint — so the metadata table stays total
    * over the corpus and corrupt blobs are queryable, not silently
    * vanished. */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc: Encoder[DecodedRow] = Encoders.product[DecodedRow]
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false) // once per partition: in-memory decode
      rows.map { r =>
        decodeImage(r.bin) match {
          case Some((w, h, c)) => DecodedRow(r.doc_id, r.bin.length, w, h, c)
          case None =>
            DecodedRow(r.doc_id, r.bin.length, -1, -1, byteChecksum(r.bin))
        }
      }
    }
  }

  /** Output of [[resize]]: the re-encoded blob plus its new dimensions. */
  final case class ResizedRow(doc_id: Long, bin: Array[Byte], width: Int,
                              height: Int)

  /** Real resize: decode → bilinear `Graphics2D.drawImage` scale to
    * w×h → re-encode as PNG. None when the input is not a decodable
    * image. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, "target dimensions must be > 0")
    readImageTotal(bytes).map { src =>
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  /** Partition-wise resize to a fixed target — the normalize step before
    * feature extraction. Same iterator shape as [[decode]] (codec setup
    * amortizes per partition); blob-in/blob-out, so stages compose:
    * `resize(...) |> decode`. Blobs the codecs cannot decode are DROPPED
    * (flatMap over the Option) — the decode-failure filter a training
    * pipeline applies before normalization; run [[decode]] first if you
    * need the reject set (its width = -1 rows are exactly the blobs
    * resize drops). */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    implicit val enc: Encoder[ResizedRow] = Encoders.product[ResizedRow]
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap(r =>
        resizeImage(r.bin, w, h).map(b => ResizedRow(r.doc_id, b, w, h)))
    }
  }

  // ---- audio ------------------------------------------------------------

  /** Extracted audio metadata per blob: real values for decodable audio,
    * -1 markers + byte-fingerprint for the rest (total over the corpus,
    * like [[DecodedRow]]). `duration_ms` derives from frames/rate. */
  final case class AudioRow(doc_id: Long, n_bytes: Int, sample_rate: Int,
                            channels: Int, frames: Long, duration_ms: Long,
                            pcm_checksum: Long)

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * readers ship with the JRE — no external dependency, the audio
    * sibling of [[decodeImage]]). Returns (sampleRate, channels, frames,
    * checksum of the 16-bit little-endian signed PCM), or None when the
    * bytes are not decodable audio. The checksum is computed on the
    * NORMALIZED PCM (16-bit LE signed at the source rate/channels), so
    * it is a content hash of the waveform, not of the container
    * encoding — a WAV and an AIFF of the same samples hash equal, as
    * [[pixelChecksum]] does for images. */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val norm = new AudioFormat(f.getSampleRate, 16, f.getChannels,
          true, false)
        val pcm = AudioSystem.getAudioInputStream(norm, in)
        val data = pcm.readAllBytes()
        // a fmt chunk may legally PARSE while declaring 0 channels or
        // a degenerate rate — frameSize 0 would divide by zero below,
        // and a 0 rate would do the same in decodeAudioRows' duration.
        // The rate guard tests the TRUNCATED int the callers divide by:
        // an AIFF 80-bit-float rate in (0,1) — or NaN, for which every
        // `<= 0` comparison is false — passes a float-typed guard and
        // still truncates to 0 (r11 review, twice)
        if (norm.getFrameSize <= 0 || f.getSampleRate.toInt <= 0) None
        else Some((f.getSampleRate.toInt, f.getChannels,
          (data.length / norm.getFrameSize).toLong, byteChecksum(data)))
      } finally in.close()
    } catch {
      // NonFatal, matching readImageTotal: the JDK audio readers throw
      // unchecked exceptions on adversarial headers BEFORE our guards
      // run (e.g. / by zero computing frameLength inside
      // getAudioInputStream — the JDK-8246260 class)
      case scala.util.control.NonFatal(_) => None
    }

  /** Partition-wise audio decode — same iterator shape as [[decode]].
    * Non-audio blobs keep their row with -1 markers and a byte-level
    * fingerprint, so corrupt blobs stay queryable (the decode-failure
    * routing, as images). */
  def decodeAudioRows(ds: Dataset[MediaRow]): Dataset[AudioRow] = {
    implicit val enc: Encoder[AudioRow] = Encoders.product[AudioRow]
    ds.mapPartitions { rows =>
      rows.map { r =>
        decodeAudio(r.bin) match {
          case Some((rate, ch, frames, chk)) =>
            AudioRow(r.doc_id, r.bin.length, rate, ch, frames,
              frames * 1000L / rate, chk)
          case None =>
            AudioRow(r.doc_id, r.bin.length, -1, -1, -1L, -1L,
              byteChecksum(r.bin))
        }
      }
    }
  }

  /** Output of [[resampleAudio]]: the re-encoded WAV plus its new rate
    * and frame count. */
  final case class ResampledRow(doc_id: Long, bin: Array[Byte],
                                sample_rate: Int, frames: Long)

  /** Real resample to `targetRate` via the JDK's format-conversion
    * providers (the audio sibling of [[resizeImage]]): decode →
    * rate-convert → re-encode as WAV. None when the input is not
    * decodable audio. The converted stream's length is unknown up
    * front, so it is drained before the WAV header (which needs the
    * frame count) is written. */
  def resampleWav(bytes: Array[Byte], targetRate: Int): Option[Array[Byte]] =
    resampleCore(bytes, targetRate).map(_._1)

  /** (wav bytes, frame count) — shared by the scalar and Dataset APIs so
    * the frame count never re-derives from header guesses. */
  private def resampleCore(bytes: Array[Byte],
                           targetRate: Int): Option[(Array[Byte], Long)] = {
    require(targetRate > 0, "target rate must be > 0")
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val target = new AudioFormat(targetRate.toFloat, 16, f.getChannels,
          true, false)
        val data = AudioSystem.getAudioInputStream(target, in).readAllBytes()
        if (target.getFrameSize <= 0) None
        else {
          val frames = (data.length / target.getFrameSize).toLong
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(
            new AudioInputStream(new ByteArrayInputStream(data), target,
              frames),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Some((bos.toByteArray, frames))
        }
      } finally in.close()
    } catch {
      // NonFatal — see decodeAudio
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Partition-wise resample — the normalize-to-one-rate step a training
    * pipeline runs before feature extraction. Blob-in/blob-out, so it
    * composes with [[decodeAudioRows]]; non-audio blobs are DROPPED (the
    * decode-failure filter, as [[resize]] for images — run
    * [[decodeAudioRows]] first for the reject set). */
  def resampleAudio(ds: Dataset[MediaRow], targetRate: Int)
      : Dataset[ResampledRow] = {
    implicit val enc: Encoder[ResampledRow] = Encoders.product[ResampledRow]
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        resampleCore(r.bin, targetRate).map { case (wav, frames) =>
          ResampledRow(r.doc_id, wav, targetRate, frames)
        }
      }
    }
  }

  /** One sampled frame of a video blob. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Fixture dir for [[q114MediaPipeline]] (once per JVM): 12
    * deterministic PNGs (id-derived dimensions, LCG pixels) plus one
    * 6-frame animated GIF — written with the JDK's own encoders, so
    * the fixture needs no binary test assets. */
  private lazy val mediaFixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-media-")
    (0 until 12).foreach { i =>
      val w = 16 + 2 * i; val h = 12 + 3 * i
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var sd = i * 2654435761L.toInt
      for (y <- 0 until h; x <- 0 until w) {
        sd = sd * 1103515245 + 12345
        img.setRGB(x, y, sd & 0xFFFFFF)
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      java.nio.file.Files.write(dir.resolve(s"img_$i.png"), bos.toByteArray)
    }
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val gifBos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(gifBos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 6).foreach { f =>
      val img = new BufferedImage(10, 10, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 10; x <- 0 until 10)
        img.setRGB(x, y, Seq(0xFF0000, 0x00FF00, 0x0000FF)(f % 3))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    java.nio.file.Files.write(dir.resolve("vid_100.gif"), gifBos.toByteArray)
    dir.toString
  }

  /** Fixture dir for [[q116AudioPipeline]] (once per JVM): 8
    * deterministic WAVs (id-derived rate/length/channels, sine PCM with
    * an LCG dither) plus one junk blob under a `.wav` name — written
    * with the JDK's own encoder, so the fixture needs no binary test
    * assets (the audio sibling of [[mediaFixtureDir]]). */
  private lazy val audioFixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-audio-")
    (0 until 8).foreach { i =>
      val rate = 8000 + 4000 * (i % 2)
      val ch = if (i % 3 == 2) 2 else 1
      val frames = 2000 + 500 * i
      val pcm = new Array[Byte](frames * 2 * ch)
      var sd = 0x9e3779b9 ^ i
      for (f <- 0 until frames; c <- 0 until ch) {
        sd = sd * 1103515245 + 12345
        val s = (math.sin(2 * math.Pi * (220 + 110 * c) * f / rate) * 12000
          + (sd % 97)).toInt.toShort
        pcm(2 * (f * ch + c)) = (s & 0xff).toByte
        pcm(2 * (f * ch + c) + 1) = (s >> 8).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
          frames.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      java.nio.file.Files.write(dir.resolve(s"audio_$i.wav"), bos.toByteArray)
    }
    // decode-failure routing: not audio, despite the extension
    java.nio.file.Files.write(dir.resolve("junk_99.wav"),
      Array.fill[Byte](128)(0x55))
    dir.toString
  }

  /** q116: the audio chain as a driver-visible query — on-disk WAVs →
    * `binaryFile` ingest → real `javax.sound.sampled` decode (rates,
    * channels, frame counts, normalized-PCM checksums, junk-blob
    * routing) → real rate conversion to 4 kHz → re-decode, summarized
    * to one deterministic row. No DuckDB oracle BY DESIGN (no SQL
    * engine decodes WAV); the driver records the rows-only check, and
    * per-stage exactness lives in AudioSpec. The `chk` column folds
    * every blob's waveform checksum, so any decode regression flips the
    * output row (q114's contract, for the audio modality). */
  def q116AudioPipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val wavs = readBlobs(s, audioFixtureDir, "*.wav")
    val d = decodeAudioRows(wavs).agg(
      count(lit(1)).as("n_blobs"),
      sum(when(col("sample_rate") > 0, 1L).otherwise(0L)).as("n_audio"),
      sum(col("n_bytes").cast("long")).as("total_bytes"),
      sum(when(col("sample_rate") > 0, col("frames")).otherwise(0L))
        .as("sum_frames"),
      sum(when(col("sample_rate") > 0, col("duration_ms")).otherwise(0L))
        .as("sum_ms"),
      countDistinct(col("pcm_checksum")).as("n_distinct"),
      sum(expr("pcm_checksum % 1000000007")).as("chk"))
    val r = {
      implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
      decodeAudioRows(resampleAudio(wavs, 4000)
        .select(col("doc_id"), col("bin")).as[MediaRow])
        .agg(sum(col("frames")).as("resampled_frames"),
          countDistinct(col("sample_rate")).as("resampled_rates"))
    }
    d.crossJoin(r) // two 1-row frames — bounded
  }

  /** q114: the multimodal chain as a driver-visible query — on-disk
    * blobs → `binaryFile` ingest → real ImageIO decode → real resize →
    * re-decode → real GIF demux, summarized to one deterministic row.
    * No DuckDB oracle BY DESIGN (no SQL engine decodes PNG/GIF); the
    * driver records the rows-only check, and the per-stage exactness
    * lives in MultimodalSpec / MultimodalIngestSpec / GifFrameSpec /
    * ImageProps. The `chk` column folds every blob's pixel checksum, so
    * any decode regression flips the output row. `dir` is unused — the
    * media fixture is self-contained, generated once per JVM. */
  /** 64-bit difference hash (dHash) — the classic perceptual image
    * fingerprint: decode, reduce to a 9×8 luma grid, one bit per
    * horizontal gradient (right cell brighter than left). Re-encoded,
    * brightness-scaled, or rescaled copies of the same picture keep
    * (almost) the same gradients, so near-duplicate IMAGES land within
    * a few Hamming bits — the visual member of the dedup family
    * (MinHash sees text, SimHash sees tokens, dHash sees pixels).
    *
    * Exactness discipline: NO floating point and NO Graphics2D resize
    * in the hash path — the 9×8 reduction is an area partition
    * (pixel x lands in cell ⌊x·9/w⌋) accumulating integer luma sums
    * (299r+587g+114b, the Rec.601 weights scaled ×1000), and the
    * gradient compare is cross-multiplied (`sumR·cntL > sumL·cntR`) so
    * unequal cell sizes never need a division. Deterministic on every
    * JVM/platform; long arithmetic is exact for images up to ~20k×20k
    * (sum·cnt < 2⁶³). Undecodable or sub-9×8 blobs return None. */
  def dhash64(bytes: Array[Byte]): Option[Long] = {
    val img = readImageTotal(bytes).orNull
    if (img == null || img.getWidth < 9 || img.getHeight < 8) return None
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val cx = (x.toLong * 9 / w).toInt
        val rgb = img.getRGB(x, y)
        sums(cy)(cx) += 299L * ((rgb >> 16) & 0xFF) +
          587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
        cnts(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var i = 0
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (sums(cy)(cx + 1) * cnts(cy)(cx) >
            sums(cy)(cx) * cnts(cy)(cx + 1)) bits |= (1L << i)
        i += 1
        cx += 1
      }
      cy += 1
    }
    Some(bits)
  }

  /** Near-dup fixture: 6 base "pictures" (smooth two-frequency sine
    * luma fields — scale-invariant structure, so a rescale preserves
    * the gradient pattern) each in three renditions: the original
    * (id b·10), a linear brightness remap (b·10+1 — order-preserving,
    * so the dHash is IDENTICAL), and a half-size rescale (b·10+2 —
    * same field sampled coarser, a few boundary bits may flip). */
  private[ops] lazy val neardupFixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-phash-")
    def field(fx: Int, fy: Int)(u: Double, v: Double): Int =
      (127.5 * (1 + math.sin(2 * math.Pi * (fx * u + fy * v)))).toInt
        .min(255)
    def write(id: Int, w: Int, h: Int, g: (Double, Double) => Int,
              remap: Int => Int): Unit = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = remap(g(x.toDouble / (w - 1), y.toDouble / (h - 1)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      java.nio.file.Files.write(dir.resolve(s"pic_$id.png"), bos.toByteArray)
    }
    val freqs = Seq((1, 0), (0, 1), (2, 1), (1, 2), (3, 2), (2, 3))
    freqs.zipWithIndex.foreach { case ((fx, fy), b) =>
      val g = field(fx, fy) _
      write(b * 10, 64, 48, g, identity)
      write(b * 10 + 1, 64, 48, g, v => v / 2 + 64) // linear remap
      write(b * 10 + 2, 32, 24, g, identity)        // half-size rescale
    }
    dir.toString
  }

  /** q182's Hamming threshold and the banding that makes it EXACT: 11
    * bands over the 64 fingerprint bits (9 bands of 6 bits + 2 of 5),
    * so a pair within [[NeardupMaxHamming]] = 10 differing bits touches
    * at most 10 bands and MUST share one untouched band verbatim —
    * pigeonhole, no recall gap. (r11: the previous 8×8-bit banding only
    * guaranteed distance ≤ 7 while the filter kept ≤ 10; pairs at 8–10
    * were found only on accidental collisions.) */
  private[ops] val NeardupMaxHamming = 10
  private val NeardupBandExpr =
    "transform(sequence(0, 10), b -> struct(b as band, " +
      "shiftright(h, CASE WHEN b < 9 THEN b * 6 ELSE 54 + (b - 9) * 5 END)" +
      " & CASE WHEN b < 9 THEN 63 ELSE 31 END as k))"

  /** Banded-Hamming near-dup pairs over a (doc_id, h) 64-bit
    * fingerprint frame: explode each hash into its 11 bands, self-join
    * on (band, key) — candidates are equi-join-generated, never
    * all-pairs — then exact `bit_count(xor)` on candidates only,
    * keeping distance ≤ [[NeardupMaxHamming]]. Complete by the band
    * pigeonhole above; ImageNeardupSpec proves banded == brute force on
    * synthetic hashes at distances 8–10 (the previous banding's silent
    * recall hole). */
  private[ops] def bandedHammingPairs(hashed: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val bands = hashed.select(col("doc_id"), col("h"),
      explode(expr(NeardupBandExpr)).as("bk"))
      .select(col("doc_id"), col("h"), col("bk.band").as("band"),
        col("bk.k").as("k"))
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.k") === col("b.k") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.h ^ b.h)").as("dist"))
      .distinct()
      .filter(col("dist") <= NeardupMaxHamming)
  }

  /** q182: perceptual image near-duplicate pairs — dHash each blob
    * (narrow mapPartitions, like [[decode]]), then
    * [[bandedHammingPairs]] on the 64-bit fingerprints (11-band
    * pigeonhole, exact for the shipped threshold 10). NO ORACLE BY
    * DESIGN (no SQL engine decodes PNG); ImageNeardupSpec hand-pins
    * the dHash bit definition, the rendition distances, and the
    * banding recall guarantee against brute force. */
  def q182ImageNeardup(s: SparkSession, dir: String): DataFrame = {
    implicit val enc: Encoder[(Long, Long)] =
      Encoders.product[(Long, Long)]
    val hashed = readBlobs(s, neardupFixtureDir, "*.png")
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap(r => dhash64(r.bin).map(hs => (r.doc_id, hs)))
      }
      .toDF("doc_id", "h")
      .localCheckpoint(true) // both sides of the band self-join
    bandedHammingPairs(hashed).orderBy("doc_a", "doc_b")
  }

  def q114MediaPipeline(s: SparkSession, dir: String): DataFrame = {
    val pngs = readBlobs(s, mediaFixtureDir, "*.png")
    val decoded = decode(pngs)
    val resized = {
      implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
      decode(resize(pngs, 24, 24)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("bin")).as[MediaRow])
    }
    val gifs = readBlobs(s, mediaFixtureDir, "*.gif")
    import org.apache.spark.sql.functions._
    val d = decoded.agg(
      count(lit(1)).as("n_blobs"),
      sum(col("n_bytes").cast("long")).as("total_bytes"),
      sum(col("width").cast("long")).as("sum_w"),
      sum(col("height").cast("long")).as("sum_h"),
      countDistinct(col("checksum")).as("n_distinct"),
      sum(expr("checksum % 1000000007")).as("chk"))
    val r = resized.agg(
      sum(col("width").cast("long")).as("resized_w"),
      sum(col("height").cast("long")).as("resized_h"))
    val g = gifFrameSample(gifs, every = 2).agg(
      count(lit(1)).as("gif_frames"))
    d.crossJoin(r).crossJoin(g) // three 1-row frames — bounded
  }

  // ---- video: MJPEG-in-AVI (RIFF) demux --------------------------------

  /** A demuxed AVI: the main header's timing/geometry plus the movi
    * frame payloads in stream order. */
  final case class AviVideo(usPerFrame: Int, totalFrames: Int, width: Int,
                            height: Int, frames: Vector[Array[Byte]])

  /** Pure-JDK RIFF walk over an MJPEG AVI: verifies the RIFF/`AVI `
    * signature, recurses into LIST chunks, reads the 56-byte `avih`
    * main header, and collects `00dc`/`00db` frame payloads in order.
    * Chunk sizes are little-endian u32 and bodies pad to even offsets
    * (the RIFF rule — exercised by the fixture's odd-sized JPEG
    * frames). Returns None for anything that is not a complete AVI
    * (wrong signature, truncated chunk, no main header) — the same
    * decode-failure routing contract as [[decodeImage]]/
    * [[decodeAudio]]. Cites the public RIFF/AVI layout (MSDN
    * 'AVI RIFF File Reference'); no reference-repo analogue (the
    * reference has no media handling — SURVEY §2.2). */
  def demuxAvi(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes.length < 12) return None
    def fourcc(off: Int) = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | (bytes(off + 1) & 0xffL) << 8 |
        (bytes(off + 2) & 0xffL) << 16 | (bytes(off + 3) & 0xffL) << 24
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(4)).toInt
    var avih: Option[(Int, Int, Int, Int)] = None
    val frames = Vector.newBuilder[Array[Byte]]
    var truncated = false
    // depth-capped: real AVIs nest LISTs 2-3 deep (RIFF→hdrl/movi→strl/
    // rec), but a crafted blob of thousands of nested LISTs passes every
    // size guard and would StackOverflowError the non-tail recursion —
    // a FATAL error no NonFatal catch can absorb (r11 review; the
    // totality property's generators cannot construct nested LISTs)
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) { truncated = true; return }
      var off = start
      while (off + 8 <= end && !truncated) {
        val id = fourcc(off)
        val size = u32(off + 4).toInt
        val body = off + 8
        // LONG arithmetic: a crafted size near Int.MaxValue wraps
        // `body + size` negative and would sail past the Int guard
        // into copyOfRange (r11 review — the totality property's
        // random bytes can't reach this 4-byte window)
        if (size < 0 || body.toLong + size.toLong > end) {
          truncated = true; return
        }
        if (id == "LIST" && size >= 4) walk(body + 4, body + size, depth + 1)
        else if (id == "avih" && size >= 56)
          avih = Some((u32(body).toInt, u32(body + 16).toInt,
            u32(body + 32).toInt, u32(body + 36).toInt))
        else if (id == "00dc" || id == "00db")
          frames += java.util.Arrays.copyOfRange(bytes, body, body + size)
        off = body + size + (size & 1) // RIFF even-padding
      }
    }
    walk(12, riffEnd, 0)
    if (truncated) None
    else avih.map { case (us, tot, w, h) =>
      AviVideo(us, tot, w, h, frames.result())
    }
  }

  /** Builds a minimal well-formed MJPEG AVI (RIFF → hdrl(avih, strl) →
    * movi(00dc…)) from pre-encoded JPEG frames — the fixture writer
    * ([[demuxAvi]]'s inverse for the subset it reads; VideoSpec pins
    * the byte-exact round trip, including odd-sized frame padding). */
  private[ops] def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                            usPerFrame: Int): Array[Byte] = {
    def le(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ le(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(kind) ++ body)
    val avih = le(usPerFrame) ++ le(0) ++ le(0) ++ le(0) ++
      le(frames.length) ++ le(0) ++ le(1) ++ le(0) ++ le(w) ++ le(h) ++
      Array.fill(4)(le(0)).flatten
    val strh = cc("vids") ++ cc("MJPG") ++ le(0) ++ le(0) ++ le(0) ++
      le(1) ++ le(1000000 / math.max(1, usPerFrame)) ++ le(0) ++
      le(frames.length) ++ le(0) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    val strf = le(40) ++ le(w) ++ le(h) ++
      Array[Byte](1, 0, 24, 0) ++ cc("MJPG") ++ le(w * h * 3) ++
      le(0) ++ le(0) ++ le(0) ++ le(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le(body.length) ++ body
  }

  /** Per-blob container metadata, total over the corpus: non-AVI blobs
    * keep their row with -1 sentinels (the q116 junk-routing
    * contract), so corrupt uploads are queryable, not vanished. */
  final case class VideoMetaRow(doc_id: Long, n_bytes: Int,
                                us_per_frame: Int, total_frames: Int,
                                n_frames: Int, width: Int, height: Int)

  def demuxAviRows(ds: Dataset[MediaRow]): Dataset[VideoMetaRow] = {
    implicit val enc: Encoder[VideoMetaRow] = Encoders.product[VideoMetaRow]
    ds.mapPartitions(_.map { r =>
      demuxAvi(r.bin) match {
        case Some(v) => VideoMetaRow(r.doc_id, r.bin.length, v.usPerFrame,
          v.totalFrames, v.frames.length, v.width, v.height)
        case None => VideoMetaRow(r.doc_id, r.bin.length, -1, -1, -1, -1, -1)
      }
    })
  }

  /** One decoded sampled frame of a video blob. */
  final case class VideoFrameRow(doc_id: Long, frame_idx: Int, width: Int,
                                 height: Int, checksum: Long)

  /** Every k-th frame of each AVI, demuxed and JPEG-decoded through
    * [[decodeImage]] (pixel-content checksums — the q114 contract for
    * moving pictures). Narrow mapPartitions: demux parallelizes per
    * blob, output is bounded by sampled-frame count, and downstream
    * per-frame rows partition like any other table. An undecodable
    * frame payload keeps its row with -1 dims and a byte checksum. */
  def aviFrameSample(ds: Dataset[MediaRow], every: Int)
      : Dataset[VideoFrameRow] = {
    require(every >= 1, s"every must be >= 1, got $every")
    implicit val enc: Encoder[VideoFrameRow] = Encoders.product[VideoFrameRow]
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap { r =>
        demuxAvi(r.bin).toSeq.flatMap { v =>
          v.frames.iterator.zipWithIndex.collect {
            case (fb, i) if i % every == 0 =>
              decodeImage(fb) match {
                case Some((w, h, c)) => VideoFrameRow(r.doc_id, i, w, h, c)
                case None =>
                  VideoFrameRow(r.doc_id, i, -1, -1, byteChecksum(fb))
              }
          }
        }
      }
    }
  }

  /** Deterministic JPEG frame image for the video fixture (LCG pixels
    * seeded by (video, frame) — shared with VideoSpec so expected
    * checksums derive from the same generator). */
  private[ops] def videoFrameImage(vid: Int, f: Int, w: Int,
                                   h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var sd = (vid * 31 + f) * 2654435761L.toInt
    for (y <- 0 until h; x <- 0 until w) {
      sd = sd * 1103515245 + 12345
      img.setRGB(x, y, sd & 0xFFFFFF)
    }
    img
  }

  private[ops] def jpegBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Fixture geometry shared with VideoSpec. */
  private[ops] val VideoFixture: Seq[(Int, Int, Int, Int, Int)] =
    (0 until 4).map(i =>
      (i, 16 + 8 * i, 12 + 4 * i, 4 + 2 * i, 33333 + 1000 * i))

  /** Fixture dir for [[q154VideoPipeline]] (once per JVM): 4 MJPEG AVIs
    * (id-derived dims/frame counts/rates, JDK-JPEG-encoded LCG frames;
    * every frame payload forced ODD-sized so the RIFF padding path is
    * always exercised — a trailing byte after JPEG EOI is ignored by
    * the decoder) plus one junk blob under a `.avi` name. The video
    * sibling of [[mediaFixtureDir]]/[[audioFixtureDir]]. */
  private lazy val videoFixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-video-")
    VideoFixture.foreach { case (i, w, h, nFrames, us) =>
      val frames = (0 until nFrames).map { f =>
        val jb = jpegBytes(videoFrameImage(i, f, w, h))
        if (jb.length % 2 == 0) jb :+ 0x00.toByte else jb
      }
      java.nio.file.Files.write(dir.resolve(s"vid_$i.avi"),
        buildAvi(frames, w, h, us))
    }
    // decode-failure routing: not RIFF, despite the extension
    java.nio.file.Files.write(dir.resolve("junk_99.avi"),
      Array.fill[Byte](96)(0x33))
    dir.toString
  }

  /** q154: the video chain as a driver-visible query — on-disk AVIs →
    * `binaryFile` ingest → real RIFF demux (headers, frame counts,
    * junk routing) → every-2nd-frame JPEG decode, summarized to one
    * deterministic row. No DuckDB oracle BY DESIGN (no SQL engine
    * demuxes AVI); the driver records the rows-only check, and
    * per-stage exactness lives in VideoSpec. The `chk` column folds
    * every sampled frame's pixel checksum, so any demux or decode
    * regression flips the output row (q114's contract, for the video
    * modality). `dir` is unused — the fixture is self-contained. */
  def q154VideoPipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val avis = readBlobs(s, videoFixtureDir, "*.avi")
    val m = demuxAviRows(avis).agg(
      count(lit(1)).as("n_blobs"),
      sum(when(col("total_frames") >= 0, 1L).otherwise(0L)).as("n_videos"),
      sum(col("n_bytes").cast("long")).as("total_bytes"),
      sum(when(col("n_frames") > 0, col("n_frames").cast("long"))
        .otherwise(0L)).as("sum_frames"),
      sum(when(col("us_per_frame") > 0, col("us_per_frame").cast("long"))
        .otherwise(0L)).as("sum_us"))
    val f = aviFrameSample(avis, every = 2).agg(
      count(lit(1)).as("sampled_frames"),
      sum(col("width").cast("long")).as("sum_w"),
      sum(col("height").cast("long")).as("sum_h"),
      countDistinct(col("checksum")).as("n_distinct"),
      sum(expr("checksum % 1000000007")).as("chk"))
    m.crossJoin(f) // two 1-row frames — bounded
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_media_pipeline" -> q114MediaPipeline _,
    "q116_audio_pipeline" -> q116AudioPipeline _,
    "q154_video_pipeline" -> q154VideoPipeline _,
    "q182_image_neardup" -> q182ImageNeardup _,
  )

  /** Per-frame placement/disposal from the GIF image metadata tree. */
  private def gifFrameMeta(reader: javax.imageio.ImageReader,
                           i: Int): (Int, Int, String) = {
    val tree = reader.getImageMetadata(i)
      .getAsTree("javax_imageio_gif_image_1.0")
      .asInstanceOf[org.w3c.dom.Element]
    def attr(tag: String, name: String, dflt: String): String = {
      val nodes = tree.getElementsByTagName(tag)
      if (nodes.getLength == 0) dflt
      else {
        val a = nodes.item(0).getAttributes.getNamedItem(name)
        if (a == null) dflt else a.getNodeValue
      }
    }
    (attr("ImageDescriptor", "imageLeftPosition", "0").toInt,
      attr("ImageDescriptor", "imageTopPosition", "0").toInt,
      attr("GraphicControlExtension", "disposalMethod", "none"))
  }

  /** REAL container demuxing for the one animated format the JDK ships
    * a reader for: each GIF blob's frames are decoded with ImageIO's
    * GIF `ImageReader`, COMPOSITED per the GIF spec (frame offsets from
    * the ImageDescriptor, `doNotDispose` accumulation,
    * `restoreToBackgroundColor` rect clears, `restoreToPrevious`
    * canvas snapshots — so delta-coded GIFs, where most frames are
    * small patches over the previous canvas, sample correct FULL
    * frames), and every `every`-th composited frame is re-encoded as a
    * standalone PNG row (GifFrameSpec drives full-frame AND delta-coded
    * fixtures end to end with exact-pixel assertions). Non-GIF blobs
    * yield no rows (the decode-failure filter, as [[resize]]). Same
    * iterator shape as [[decode]]: the reader spins up per partition
    * and `dispose()`s per blob, and the per-frame output rows
    * hash-partition downstream so frame-level feature extraction
    * parallelizes beyond the video count. Compositing forces decoding
    * every frame (sampled or not) — inherent to delta coding, where
    * frame k's pixels depend on frames 0..k-1. */
  def gifFrameSample(ds: Dataset[MediaRow], every: Int): Dataset[FrameRow] = {
    require(every > 0, "every must be > 0")
    implicit val enc: Encoder[FrameRow] = Encoders.product[FrameRow]
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val readers = ImageIO.getImageReadersByFormatName("gif")
        if (!readers.hasNext) Iterator.empty
        else {
          val reader = readers.next()
          val in = ImageIO.createImageInputStream(
            new ByteArrayInputStream(r.bin))
          try {
            reader.setInput(in, false, false) // metadata drives compositing
            val n =
              try reader.getNumImages(true)
              catch { case _: Exception => 0 } // not a GIF: drop the blob
            if (n == 0) Vector.empty
            else try {
              // logical screen from the stream metadata; a frame can be
              // a small patch of it
              val (sw, sh) = {
                val t = reader.getStreamMetadata
                  .getAsTree("javax_imageio_gif_stream_1.0")
                  .asInstanceOf[org.w3c.dom.Element]
                val lsd = t.getElementsByTagName("LogicalScreenDescriptor")
                if (lsd.getLength == 0)
                  (reader.getWidth(0), reader.getHeight(0))
                else {
                  val a = lsd.item(0).getAttributes
                  (a.getNamedItem("logicalScreenWidth").getNodeValue.toInt,
                    a.getNamedItem("logicalScreenHeight").getNodeValue.toInt)
                }
              }
              var canvas = new BufferedImage(sw.max(1), sh.max(1),
                BufferedImage.TYPE_INT_ARGB)
              def copyOf(img: BufferedImage): BufferedImage = {
                val c = new BufferedImage(img.getWidth, img.getHeight,
                  BufferedImage.TYPE_INT_ARGB)
                val g = c.createGraphics()
                try g.drawImage(img, 0, 0, null) finally g.dispose()
                c
              }
              val out = Vector.newBuilder[FrameRow]
              for (i <- 0 until n) {
                val raster = reader.read(i)
                val (left, top, disposal) = gifFrameMeta(reader, i)
                val snapshot =
                  if (disposal == "restoreToPrevious") copyOf(canvas)
                  else null
                val g = canvas.createGraphics()
                try g.drawImage(raster, left, top, null) finally g.dispose()
                if (i % every == 0) {
                  val bos = new ByteArrayOutputStream()
                  ImageIO.write(canvas, "png", bos)
                  out += FrameRow(r.doc_id, i, bos.toByteArray)
                }
                disposal match {
                  case "restoreToBackgroundColor" =>
                    // spec: the frame's rect reverts; transparent is the
                    // universal rendering (as browsers do)
                    val g2 = canvas.createGraphics()
                    try {
                      g2.setComposite(java.awt.AlphaComposite.Clear)
                      g2.fillRect(left, top, raster.getWidth,
                        raster.getHeight)
                    } finally g2.dispose()
                  case "restoreToPrevious" => canvas = snapshot
                  case _ => () // none / doNotDispose: accumulate
                }
              }
              out.result()
            } catch {
              // a blob can pass getNumImages and still be truncated
              // MID-FRAME: reader.read(i) / metadata access then throws
              // (the r11 WBMP totality class) — that is a corrupt blob
              // to drop, not a stage-killing crash
              case scala.util.control.NonFatal(_) => Vector.empty
            }
          } finally {
            // dispose() does NOT close the reader's input stream — an
            // unclosed ImageInputStream per blob would leak (temp-file
            // handles, if caching were ever enabled)
            reader.dispose(); in.close()
          }
        }
      }
    }
  }

  /** Frame sampling: treat a video blob as fixed-size frame records and
    * emit every `every`-th frame as its own row (`flatMap` — one input
    * row explodes to its sampled frames; a trailing partial frame is
    * dropped, as a real demuxer drops a truncated tail). Downstream the
    * per-frame rows hash-partition like any other table, so frame-level
    * feature extraction parallelizes beyond the video count. The JDK
    * ships no video container demuxer, so slicing stays fixed-size; a
    * codec-library build replaces only the slicing, not the
    * every-k-th-keyframe contract. */
  def frameSample(ds: Dataset[MediaRow], frameBytes: Int,
                  every: Int): Dataset[FrameRow] = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be > 0")
    implicit val enc: Encoder[FrameRow] = Encoders.product[FrameRow]
    ds.flatMap { r =>
      val nFrames = r.bin.length / frameBytes
      (0 until nFrames by every).map { i =>
        FrameRow(r.doc_id, i,
          java.util.Arrays.copyOfRange(r.bin, i * frameBytes,
            (i + 1) * frameBytes))
      }
    }
  }
}
