package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Event-time data contract asserted by Tables.scala's doc:
  *  - `events.ts` loads as one of the physical types [[T.tus]]
  *    dispatches on (ns-long, TIMESTAMP, TIMESTAMP_NTZ) — the driver
  *    has regenerated the testdata across encodings before (round 8:
  *    TIMESTAMP(NANOS) → timestamp[us]), and an unrecognized encoding
  *    must fail HERE with the observed type, not as 13 opaque
  *    per-query errors;
  *  - `tus >= 0` (post-1970) — keeps Spark `div` and DuckDB `//`
  *    floor-division in agreement for day/window bucketing;
  *  - `tus` magnitude is a plausible µs epoch — a unit slip in the
  *    dispatch (ms or ns reaching queries as "µs") moves the value by
  *    1000× and fails loudly here. */
class DataContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("every declared query has a DuckDB oracle or is on the named " +
    "ScalaTest-verified exception list (the driver records only a weak " +
    "rows-check without an oracle — additions must opt out explicitly)") {
    val noOracle = Set( // each verified by a dedicated ScalaTest suite
      // q36/q39 left this list in r16: self-validating outputs (exact
      // values + bound verdicts the oracle asserts TRUE) put the
      // sketches under the driver hash gate; HllBoundSpec still pins
      // the raw estimates independently
      "q06_sink_layout",         // LayoutSpec
      "q114_media_pipeline",     // Multimodal*/GifFrameSpec/ImageProps
                                 // (no SQL engine decodes PNG/GIF)
      "q116_audio_pipeline",     // AudioSpec (no SQL engine decodes WAV)
      "q154_video_pipeline",     // VideoSpec (no SQL engine demuxes AVI)
      "q168_compress_signal",    // CompressSignalSpec (no SQL engine
                                 // exposes a deflate length)
      "q182_image_neardup")      // ImageNeardupSpec (no SQL engine
                                 // decodes PNG)
    val queries = graft.SparkEntry.queries.keySet
    val oracles = graft.SparkEntry.oracleSql.keySet
    assert((queries -- oracles -- noOracle).isEmpty,
      s"queries without oracle: ${queries -- oracles -- noOracle}")
    assert((oracles -- queries).isEmpty,
      s"orphan oracle entries: ${oracles -- queries}")
  }

  test("T.tus yields the SAME µs epoch for the same instant under every " +
    "dispatched encoding (ns-long, TIMESTAMP, TIMESTAMP_NTZ)") {
    import spark.implicits._
    // instants straddling a µs boundary: the ns encoding carries sub-µs
    // residue that must truncate (div), not round
    val micros = Seq(0L, 1L, 999999L, 1704067200123456L, 1704067200123457L)
    val asNs = micros.map(us => us * 1000L + 789L) // sub-µs residue
    val fromLong = T.withTus(asNs.toDF("ts"))
      .select("tus").as[Long].collect().toSeq
    val fromTs = T.withTus(
      micros.toDF("us").selectExpr("timestamp_micros(us) as ts"))
      .select("tus").as[Long].collect().toSeq
    val fromNtz = T.withTus(
      micros.toDF("us")
        .selectExpr("cast(timestamp_micros(us) as timestamp_ntz) as ts"))
      .select("tus").as[Long].collect().toSeq
    assert(fromLong == micros, s"ns-long dispatch: $fromLong")
    assert(fromTs == micros, s"timestamp dispatch: $fromTs")
    assert(fromNtz == micros, s"timestamp_ntz dispatch: $fromNtz")
  }

  test("T.tus fails loudly (naming the type) on an undispatched encoding") {
    import spark.implicits._
    val e = intercept[IllegalStateException] {
      T.withTus(Seq("2024-01-01").toDF("ts"))
    }
    assert(e.getMessage.contains("StringType"), e.getMessage)
    assert(e.getMessage.contains("events.ts"), e.getMessage)
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"events.ts at $sf loads as a dispatched physical type and " +
      "tus is a non-negative, µs-magnitude epoch") {
      val e = T.events(spark, s"/root/testdata/$sf") // throws on unknown type
      val Row(lo: Long, hi: Long) =
        e.agg(min(col("tus")), max(col("tus"))).collect()(0)
      assert(lo >= 0L, s"pre-1970 tus $lo breaks the floor-div contract")
      // 2001-09..2262-04 in µs — a ms-epoch is ~1e12, an ns-epoch ~1e18;
      // either unit slip lands far outside this band.
      assert(hi >= 1000000000000000L && hi < 9223372036854L * 1000000L,
        s"max tus $hi is not µs magnitude — dispatch unit slip?")
      // q206's (2n+d) div (2d) is HALF-UP only for non-negative n
      // (both engines truncate toward zero, so a negative numerator
      // silently flips the rounding to half-down); the fixture keeps
      // values non-negative so the formula's direction never varies
      val Row(vlo: Double) = e.agg(min(col("value"))).collect()(0)
      assert(vlo >= 0.0, s"negative events.value $vlo breaks q206's " +
        "non-negative half-up division contract")
    }

    test(s"documents.text at $sf is pure ASCII (q85's rolling-hash " +
      "injectivity and Spark↔DuckDB ascii()/ord() parity both assume " +
      "codepoints < 257 — a generator change must fail loudly here, not " +
      "silently corrupt fingerprints)") {
      val nonAscii = T(spark, s"/root/testdata/$sf", "documents")
        .filter(!col("text").rlike("^[\\x00-\\x7f]*$")).count()
      assert(nonAscii == 0L)
    }

    test(s"documents.text at $sf has no NULLs (Simhash64 deliberately " +
      "yields NULL where the replaced SQL pipeline produced '0'*64 — a " +
      "semantics change justified BY this no-NULL contract; a regenerated " +
      "corpus with NULL texts would silently diverge q77/q88/q109 from " +
      "the unchanged DuckDB oracle, so the contract fails loudly here)") {
      val nulls = T(spark, s"/root/testdata/$sf", "documents")
        .filter(col("text").isNull).count()
      assert(nulls == 0L)
    }

    test(s"documents.source and .lang at $sf are never NULL (q97's " +
      "rebalance counts, q150/q151's budget specs, and q186's " +
      "driver-side Hamilton sort all key on them — a NULL source would " +
      "NPE the apportionment sort rather than fail loudly here)") {
      val nulls = T(spark, s"/root/testdata/$sf", "documents")
        .filter(col("source").isNull || col("lang").isNull).count()
      assert(nulls == 0L)
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
