package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

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
  * dimensions and re-encode scaled output. Blobs that are not decodable
  * images take a documented fallback (byte-level fingerprint in
  * [[decode]]; dropped by [[resize]]) — the decode-failure routing every
  * real media pipeline needs, since a 100 TB blob store always contains
  * some corrupt or mislabeled files. Container demuxing is real for the
  * one animated format the JDK reads ([[gifFrameSample]]: per-frame
  * GIF extraction via `ImageReader`); [[frameSample]] keeps the
  * fixed-size-frame model for raw frame streams — the every-k-th-frame
  * contract is the same in both.
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

  /** Real image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG readers
    * ship with the JRE). Returns (width, height, pixel checksum), or
    * None when the bytes are not a decodable image. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else Some((img.getWidth, img.getHeight, pixelChecksum(img)))
  }

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
    val src = ImageIO.read(new ByteArrayInputStream(bytes))
    if (src == null) None
    else {
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      Some(bos.toByteArray)
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

  /** q114: the multimodal chain as a driver-visible query — on-disk
    * blobs → `binaryFile` ingest → real ImageIO decode → real resize →
    * re-decode → real GIF demux, summarized to one deterministic row.
    * No DuckDB oracle BY DESIGN (no SQL engine decodes PNG/GIF); the
    * driver records the rows-only check, and the per-stage exactness
    * lives in MultimodalSpec / MultimodalIngestSpec / GifFrameSpec /
    * ImageProps. The `chk` column folds every blob's pixel checksum, so
    * any decode regression flips the output row. `dir` is unused — the
    * media fixture is self-contained, generated once per JVM. */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_media_pipeline" -> q114MediaPipeline _,
  )

  /** REAL container demuxing for the one animated format the JDK ships
    * a reader for: every `every`-th frame of each GIF blob is decoded
    * with ImageIO's GIF `ImageReader` and re-encoded as a standalone
    * PNG row — actual frame extraction, not byte slicing (GifFrameSpec
    * drives multi-frame GIFs end to end and re-decodes exact frame
    * pixels). Non-GIF blobs yield no rows (the decode-failure filter,
    * as [[resize]]). Same iterator shape as [[decode]]: the reader spins
    * up per partition and `dispose()`s per blob, and the per-frame
    * output rows hash-partition downstream so frame-level feature
    * extraction parallelizes beyond the video count.
    *
    * NOTE: frames are decoded independently (`reader.read(i)` returns
    * the raw frame raster); GIFs using inter-frame delta coalescing
    * would need frame compositing on top — out of scope for the
    * fixture-grade full-frame GIFs this targets. */
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
            reader.setInput(in, false, true)
            val n =
              try reader.getNumImages(true)
              catch { case _: Exception => 0 } // not a GIF: drop the blob
            (0 until n by every).iterator.map { i =>
              val img = reader.read(i)
              val bos = new ByteArrayOutputStream()
              ImageIO.write(img, "png", bos)
              FrameRow(r.doc_id, i, bos.toByteArray)
            }.toVector
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
