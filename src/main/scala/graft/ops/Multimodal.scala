package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_extract}

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is modeled as an opaque `binary` column plus typed metadata —
  * the layout a 100 TB training-data pipeline uses (content-addressed
  * blobs co-partitioned with their metadata). The decode/feature-extract
  * stage runs partition-wise over a typed `Dataset` (`mapPartitions`: one
  * iterator per partition, so a real decoder amortizes model/codec init
  * per partition, not per row).
  *
  * The actual decoder is a clearly-marked deterministic STUB — the
  * image/audio codecs are not available in this environment. Everything
  * around it (schema, encoders, partition-wise batching, determinism) is
  * real and covered by MultimodalSpec; swapping `decodeStub` for a JNI or
  * codec-library call changes no plumbing.
  */
object Multimodal {

  /** Input: opaque media blob keyed by document. */
  final case class MediaRow(doc_id: Long, bin: Array[Byte])

  /** Ingests on-disk media blobs through Spark's `binaryFile` source —
    * the real read path in front of [[decode]]/[[resize]]/[[frameSample]]
    * (MultimodalIngestSpec drives the whole chain end to end). Files are
    * expected to follow the content-addressed `<anything><id>.bin`
    * convention (the numeric id keys the blob to its metadata row); the
    * source splits the listing across tasks, so a million blobs
    * parallelize like any other table scan. `binaryFile` reads each
    * whole file as one `content` cell — the right model for media blobs
    * (bounded per-file size), not for multi-GB archives, which would
    * want a custom DSv2 source with range reads. */
  def readBlobs(spark: SparkSession, path: String,
                pattern: String = "*.bin"): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern)
      .load(path)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[a-z0-9]+$", 1)
          .cast("long").as("doc_id"),
        col("content").as("bin"))
      .as[MediaRow]
  }

  /** Output: extracted features/metadata per blob. */
  final case class DecodedRow(doc_id: Long, n_bytes: Int, width: Int,
                              height: Int, checksum: Long)

  /** STUB — stands in for a real image decode + feature extraction.
    * Deterministic in the blob bytes (a polynomial checksum and fake
    * dimensions derived from it), so tests can assert exact outputs. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val checksum = bytes.foldLeft(1125899906842597L)((a, b) => 31 * a + b)
    val width = 16 + (math.floorMod(checksum, 64)).toInt
    val height = 16 + (math.floorMod(checksum >> 6, 64)).toInt
    (width, height, checksum)
  }

  /** Partition-wise decode: one `decodeStub` (→ real codec) call per row,
    * iterator-in/iterator-out so per-partition setup happens once. */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc: Encoder[DecodedRow] = Encoders.product[DecodedRow]
    ds.mapPartitions { rows =>
      // a real decoder opens its codec/session HERE, once per partition
      rows.map { r =>
        val (w, h, c) = decodeStub(r.bin)
        DecodedRow(r.doc_id, r.bin.length, w, h, c)
      }
    }
  }

  /** Output of [[resize]]: the re-encoded blob plus its new dimensions. */
  final case class ResizedRow(doc_id: Long, bin: Array[Byte], width: Int,
                              height: Int)

  /** STUB resize — stands in for decode→scale→re-encode. Deterministic:
    * the "re-encoded" blob is a byte subsample whose length scales with
    * the target area, so size/shape assertions are exact. A real
    * implementation swaps only this function. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(1, math.min(bytes.length, (w * h) / 8))
    val step = math.max(1, bytes.length / n)
    bytes.indices.by(step).take(n).map(bytes(_)).toArray
  }

  /** Partition-wise resize to a fixed target — the normalize step before
    * feature extraction. Same iterator shape as [[decode]] (codec init
    * amortizes per partition); blob-in/blob-out, so stages compose:
    * `resize(...) |> decode`. */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    implicit val enc: Encoder[ResizedRow] = Encoders.product[ResizedRow]
    ds.mapPartitions { rows =>
      rows.map(r => ResizedRow(r.doc_id, resizeStub(r.bin, w, h), w, h))
    }
  }

  /** One sampled frame of a video blob. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: treat a video blob as fixed-size frame records and
    * emit every `every`-th frame as its own row (`flatMap` — one input
    * row explodes to its sampled frames; a trailing partial frame is
    * dropped, as a real demuxer drops a truncated tail). Downstream the
    * per-frame rows hash-partition like any other table, so frame-level
    * feature extraction parallelizes beyond the video count. A real
    * implementation replaces fixed-size slicing with container demuxing
    * (the `every`-th-keyframe contract is unchanged). */
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
