package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Event-time data contract asserted by Tables.scala's doc:
  *  - `ts >= 0` (post-1970) — keeps Spark `div` and DuckDB `//`
  *    floor-division in agreement for the µs quantization;
  *  - the raw ns values are NOT µs-aligned (the testdata has genuine
  *    sub-µs precision), which is exactly why every declared query must
  *    quantize to µs before boundary comparisons — this test documents
  *    that the hazard is real, so nobody "simplifies" the quantization
  *    away against data that happens to be aligned. */
class DataContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("every declared query has a DuckDB oracle or is on the named " +
    "ScalaTest-verified exception list (the driver records only a weak " +
    "rows-check without an oracle — additions must opt out explicitly)") {
    val noOracle = Set( // each verified by a dedicated ScalaTest suite
      "q06_sink_layout",         // LayoutSpec
      "q36_agg_approx_distinct", // HllBoundSpec
      "q39_approx_percentile",   // HllBoundSpec
      "q114_media_pipeline",     // Multimodal*/GifFrameSpec/ImageProps
                                 // (no SQL engine decodes PNG/GIF)
      "q116_audio_pipeline")     // AudioSpec (no SQL engine decodes WAV)
    val queries = graft.SparkEntry.queries.keySet
    val oracles = graft.SparkEntry.oracleSql.keySet
    assert((queries -- oracles -- noOracle).isEmpty,
      s"queries without oracle: ${queries -- oracles -- noOracle}")
    assert((oracles -- queries).isEmpty,
      s"orphan oracle entries: ${oracles -- queries}")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"events.ts at $sf is non-negative (floor-div contract)") {
      val bad = T(spark, s"/root/testdata/$sf", "events")
        .filter(col("ts") < 0).count()
      assert(bad == 0L)
    }

    test(s"events.ts at $sf has sub-µs precision (quantization is load-bearing)") {
      val subUs = T(spark, s"/root/testdata/$sf", "events")
        .filter(col("ts") % 1000 =!= 0).count()
      assert(subUs > 0L)
    }

    test(s"documents.text at $sf is pure ASCII (q85's rolling-hash " +
      "injectivity and Spark↔DuckDB ascii()/ord() parity both assume " +
      "codepoints < 257 — a generator change must fail loudly here, not " +
      "silently corrupt fingerprints)") {
      val nonAscii = T(spark, s"/root/testdata/$sf", "documents")
        .filter(!col("text").rlike("^[\\x00-\\x7f]*$")).count()
      assert(nonAscii == 0L)
    }

    test(s"embeddings at $sf contain no all-zero vector (q99's scale " +
      "would be 0: Spark's 0/0 → NaN codes cast to 0 vs DuckDB's NULL " +
      "division — a silent cross-engine divergence; a generator change " +
      "must fail here instead)") {
      val zeroVecs = T(spark, s"/root/testdata/$sf", "embeddings")
        .filter(graft.functions.VecDot.normSq(col("embedding")) === 0.0)
        .count()
      assert(zeroVecs == 0L)
    }
  }
}
