package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

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
}
