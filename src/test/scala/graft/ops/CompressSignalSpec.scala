package graft.ops

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.DeflateLen

/** q168 (compression-ratio quality signal) — the no-oracle evidence:
  * an independent `java.util.zip` recompute of every row, hand cases
  * pinning that repetition compresses and high-entropy text doesn't,
  * and non-degenerate flag classes on the real corpus.
  */
class CompressSignalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Independent reference: one-shot Deflater at the pinned level. */
  private def refLen(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes); d.finish()
      val out = new Array[Byte](bytes.length * 2 + 128)
      var total = 0L
      while (!d.finished()) total += d.deflate(out)
      total
    } finally d.end()
  }

  test("kernel: repetition compresses hard, high-entropy text doesn't, " +
    "and the expression equals the one-shot reference") {
    val rep = "spam ham " * 200
    val rnd = new scala.util.Random(11)
    val noise = Seq.fill(400)(rnd.nextPrintableChar()).mkString
    for (s <- Seq(rep, noise, "x", "ab" * 3)) {
      assert(DeflateLen.deflatedLen(UTF8String.fromString(s)) == refLen(s),
        s"kernel drift on ${s.take(20)}")
    }
    assert(refLen(rep) * 10 < rep.getBytes("UTF-8").length,
      "repetition should compress below 10%")
    assert(refLen(noise) * 2 > noise.getBytes("UTF-8").length,
      "high-entropy text should stay above 50%")
  }

  test("q168 rows equal the independent recompute on sf0.001 and both " +
    "flag classes are non-empty") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Curation.q168CompressSignal(spark, dir).collect()
    assert(rows.length == texts.size)
    var flagged = 0
    rows.foreach { r =>
      val (id, nb, db, ratio) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val t = texts(id)
      assert(nb == t.getBytes("UTF-8").length.toLong, s"doc $id bytes")
      assert(db == refLen(t), s"doc $id deflate")
      val expect = ((2 * db * 10000 + nb) / (2 * nb)).toDouble / 10000.0
      assert(ratio == expect, s"doc $id ratio")
      assert(r.getBoolean(4) == (ratio < 0.45), s"doc $id flag")
      if (r.getBoolean(4)) flagged += 1
    }
    assert(flagged > 0 && flagged < rows.length,
      s"degenerate flag classes: $flagged of ${rows.length}")
  }
}
