package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}

import javax.imageio.ImageIO

import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Multimodal.MediaRow

/** Drives the multimodal read path end to end ON REAL PNGs: on-disk
  * image files → `binaryFile` source → real ImageIO decode → resize →
  * frameSample. Pins the ingestion details (listing, glob filter, id
  * extraction, ANSI-safe handling of digit-less names, content bytes)
  * and the narrow-stage behavior of the chain. */
class MultimodalIngestSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestBase.spark

  private def png(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (seed * 2654435761L + x * 3 + y * 101).toInt & 0xFFFFFF)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def dims(i: Int): (Int, Int) = (16 + 4 * i, 12 + 3 * i)

  private var tmpDirs: List[Path] = Nil

  /** 6 real PNG blobs with id-derived dimensions, one non-matching decoy
    * the glob filter must skip, and one glob-MATCHED file with no
    * trailing digits — the shape that used to abort the whole scan under
    * ANSI mode at the long cast. */
  private lazy val blobDir = {
    val dir = Files.createTempDirectory("blobs-")
    tmpDirs ::= dir
    (0 until 6).foreach { i =>
      val (w, h) = dims(i)
      Files.write(dir.resolve(s"blob_$i.png"), png(w, h, i))
    }
    Files.write(dir.resolve("manifest.txt"), "not a blob".getBytes)
    Files.write(dir.resolve("nodigits.png"), png(8, 8, 77))
    dir.toString
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach { d =>
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.toList.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    super.afterAll()
  }

  test("binaryFile ingestion: ids and bytes round-trip; decoy and " +
    "digit-less names filtered, not fatal") {
    val rows = Multimodal.readBlobs(spark, blobDir, "*.png").collect()
      .sortBy(_.doc_id)
    // nodigits.png matches the glob but has no trailing id: it must be
    // filtered out (NOT crash the scan with CAST_INVALID_INPUT)
    assert(rows.map(_.doc_id).toSeq == (0L until 6L))
    rows.foreach { r =>
      val (w, h) = dims(r.doc_id.toInt)
      assert(java.util.Arrays.equals(r.bin, png(w, h, r.doc_id.toInt)),
        s"blob ${r.doc_id} bytes corrupted in flight")
    }
  }

  test("ingest -> decode -> resize -> frameSample chain: real dimensions " +
    "from real codecs, narrow stages throughout") {
    val ds = Multimodal.readBlobs(spark, blobDir, "*.png")
    val inParts = ds.rdd.getNumPartitions
    assert(inParts >= 1)

    val decoded = Multimodal.decode(ds)
    // mapPartitions is narrow: the decode stage must not introduce a
    // shuffle (per-partition codec init is the whole point)
    assert(decoded.rdd.getNumPartitions == inParts)
    val byId = decoded.collect().map(d => d.doc_id -> d).toMap
    (0 until 6).foreach { i =>
      val (w, h) = dims(i)
      val d = byId(i.toLong)
      assert((d.width, d.height) == ((w, h)),
        s"doc $i: decode must report the true PNG dimensions")
      assert(d.n_bytes == png(w, h, i).length)
      assert(d.checksum == Multimodal.decodeImage(png(w, h, i)).get._3)
    }

    // real resize: every output re-decodes at exactly the target shape
    val resized = Multimodal.resize(ds, 24, 24)
    assert(resized.rdd.getNumPartitions == inParts)
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val redecoded = Multimodal.decode(
      resized.select(col("doc_id"), col("bin")).as[MediaRow]).collect()
    assert(redecoded.length == 6)
    redecoded.foreach(d => assert((d.width, d.height) == ((24, 24))))

    val frames = Multimodal.frameSample(ds, frameBytes = 16, every = 2)
    assert(frames.rdd.getNumPartitions == inParts) // flatMap: narrow too
    val perDoc = frames.collect().groupBy(_.doc_id).view.mapValues(_.length)
    (0 until 6).foreach { i =>
      val (w, h) = dims(i)
      val nBytes = png(w, h, i).length
      val expected = (nBytes / 16 + 1) / 2 // ceil(nFrames / every)
      assert(perDoc(i.toLong) == expected, s"doc $i frame count")
    }
  }

  test("colliding trailing ids are the caller's problem and surface as " +
    "duplicate keys (documented contract)") {
    val dir = Files.createTempDirectory("blobs-collide-")
    tmpDirs ::= dir
    Files.write(dir.resolve("a_7.png"), png(8, 8, 1))
    Files.write(dir.resolve("b7.png"), png(8, 8, 2))
    val rows = Multimodal.readBlobs(spark, dir.toString, "*.png").collect()
    assert(rows.length == 2 && rows.forall(_.doc_id == 7L),
      "both files map to doc_id 7 — duplicates pass through undropped")
  }
}
