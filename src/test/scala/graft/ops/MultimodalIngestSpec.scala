package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Drives the multimodal read path end to end: on-disk blobs →
  * `binaryFile` source → [[Multimodal.decode]] → [[Multimodal.frameSample]].
  * The earlier MultimodalSpec covers the typed transforms over in-memory
  * data; this one pins the actual ingestion (listing, glob filter, id
  * extraction, content bytes) and the partition behavior of the chain. */
class MultimodalIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 6 deterministic blobs, 64 + 32·i bytes each, plus one decoy file
    * the glob filter must skip. */
  private lazy val blobDir = {
    val dir = Files.createTempDirectory("blobs-")
    (0 until 6).foreach { i =>
      val bytes = Array.tabulate(64 + 32 * i)(j => ((i * 17 + j) % 256).toByte)
      Files.write(dir.resolve(s"blob_$i.bin"), bytes)
    }
    Files.write(dir.resolve("manifest.txt"), "not a blob".getBytes)
    dir.toString
  }

  test("binaryFile ingestion: ids and bytes round-trip, decoy filtered") {
    val rows = Multimodal.readBlobs(spark, blobDir).collect()
      .sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == (0L until 6L))
    rows.foreach { r =>
      val expected =
        Array.tabulate(64 + 32 * r.doc_id.toInt)(j =>
          ((r.doc_id * 17 + j) % 256).toByte)
      assert(java.util.Arrays.equals(r.bin, expected),
        s"blob ${r.doc_id} bytes corrupted in flight")
    }
  }

  test("ingest -> decode -> frameSample chain: stub features match a " +
    "direct call and partitioning carries through") {
    val ds = Multimodal.readBlobs(spark, blobDir)
    val inParts = ds.rdd.getNumPartitions
    assert(inParts >= 1)

    val decoded = Multimodal.decode(ds)
    // mapPartitions is narrow: the decode stage must not introduce a
    // shuffle (per-partition codec init is the whole point)
    assert(decoded.rdd.getNumPartitions == inParts)
    val byId = decoded.collect().map(d => d.doc_id -> d).toMap
    (0 until 6).foreach { i =>
      val bytes = Array.tabulate(64 + 32 * i)(j => ((i * 17 + j) % 256).toByte)
      val (w, h, c) = Multimodal.decodeStub(bytes)
      val d = byId(i.toLong)
      assert((d.width, d.height, d.checksum) == ((w, h, c)))
      assert(d.n_bytes == bytes.length)
    }

    val frames = Multimodal.frameSample(ds, frameBytes = 16, every = 2)
    assert(frames.rdd.getNumPartitions == inParts) // flatMap: narrow too
    val perDoc = frames.collect().groupBy(_.doc_id).view.mapValues(_.length)
    // blob i has (64 + 32i)/16 = 4 + 2i frames; every 2nd → 2 + i
    (0 until 6).foreach { i =>
      assert(perDoc(i.toLong) == 2 + i, s"doc $i frame count")
    }
  }
}
