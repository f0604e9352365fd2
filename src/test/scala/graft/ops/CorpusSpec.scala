package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Independent-formulation cross-checks for the r7 corpus/analytics ops
  * (q117/q118/q119) beyond the DuckDB oracle: plain-Scala brute force on
  * the sf0.001 testdata, built WITHOUT hashing or SQL (raw window
  * strings, in-memory maps), so a shared misconception between the Spark
  * query and its structurally similar oracle SQL — or an md5 collision —
  * would be caught here. Each test also pins that the fixture actually
  * carries signal (non-zero duplication / a multi-day cohort spread), so
  * a silently empty result can never pass as green. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  /** 1-based positions 1, 11, 21, … of full 50-char windows — the same
    * contract as the query's `sequence(1, length-49, 10)`. */
  private def windows(text: String): Seq[String] =
    (0 to text.length - 50 by 10).map(i => text.substring(i, i + 50))

  private lazy val docs: Seq[(Long, String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
  }

  test("q117 matches raw-string brute force (no md5) and has dup signal") {
    import spark.implicits._
    val winsByDoc = docs.filter(_._3.length >= 50)
      .map { case (id, _, t) => id -> windows(t) }
    val docsByWin = winsByDoc
      .flatMap { case (id, ws) => ws.map(_ -> id) }
      .groupMap(_._1)(_._2).map { case (w, ids) => w -> ids.toSet }
    val expected = winsByDoc.map { case (id, ws) =>
      id -> ((ws.size.toLong, ws.count(w => docsByWin(w).size > 1).toLong))
    }.toMap

    val got = Corpus.q117SubstringDedup(spark, Sf)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, d) => id -> ((n, d)) }.toMap
    assert(got == expected)
    assert(got.valuesIterator.map(_._2).sum > 0,
      "fixture carries no duplicated windows — the test is vacuous")
  }

  test("q118 matches brute-force per-pair distinct-window intersections") {
    import spark.implicits._
    val bySource = docs.filter(_._3.length >= 50)
      .groupMap(_._2)(d => windows(d._3))
      .map { case (src, ws) => src -> ws.flatten.toSet }
    val expected = (for {
      (sa, wa) <- bySource; (sb, wb) <- bySource if sa < sb
      shared = (wa & wb).size if shared > 0
    } yield (sa, sb) -> shared.toLong).toMap

    val got = Corpus.q118SourceOverlap(spark, Sf)
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(got == expected)
    assert(got.nonEmpty, "no cross-source overlap in fixture — vacuous")
  }

  test("q119 matches a brute-force cohort matrix; cohorts span >1 day") {
    import spark.implicits._
    val events = T.events(spark, Sf)
      .select("user_id", "tus", "event_type")
      .as[(Long, Long, String)].collect().toSeq
    def day(tus: Long): Long = tus / 86400000000L
    val cohort = events.filter(_._3 == "purchase")
      .groupMap(_._1)(e => day(e._2)).map { case (u, ds) => u -> ds.min }
    val expected = events.flatMap { case (u, ts, _) =>
      cohort.get(u).collect { case c if day(ts) >= c => (u, c, day(ts) - c) }
    }.distinct.groupMapReduce(e => (e._2, e._3))(_ => 1L)(_ + _)

    val out = Curation.q119RetentionCohort(spark, Sf)
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    assert(out == expected)
    assert(expected.keysIterator.map(_._1).toSet.size > 1,
      "single-day cohort fixture — matrix degenerate, test weakened")
  }

  test("q123 matches a raw-string brute-force excision (md5 only at the end)") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // Dup detection on RAW segment strings — md5 appears only when
    // digesting the final cleaned text, so a collision inside the
    // query's digest-keyed shuffle would be caught here.
    val segsByDoc = docs.map { case (id, _, t) =>
      id -> t.split(" ", -1).grouped(10).map(_.mkString(" ")).toVector
    }
    val docsPerSeg = segsByDoc
      .flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupMap(_._1)(_._2).map { case (s, ids) => s -> ids.toSet }
    val expected = segsByDoc.map { case (id, ss) =>
      val kept = ss.filter(s => docsPerSeg(s).size <= 1)
      id -> ((ss.size.toLong, kept.size.toLong, md5hex(kept.mkString(" "))))
    }.toMap

    val got = Corpus.q123SegmentDedup(spark, Sf)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, k, h) => id -> ((n, k, h)) }.toMap
    assert(got == expected)
    val removed = expected.valuesIterator.map(v => v._1 - v._2).sum
    assert(removed > 0, "no cross-doc duplicate segments — excision vacuous")
    assert(expected.valuesIterator.exists(v => v._2 > 0 && v._1 > v._2),
      "no PARTIAL excision — reconstruction path untested")
  }

  test("q129 matches a brute-force ticket minimum and upsamples weight-3 langs") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val weights = Map("en" -> 1, "fr" -> 2, "es" -> 2, "zh" -> 3, "de" -> 3)
    val langs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().toSeq
    val expected = langs.map { case (id, lang) =>
      val key = (1 to weights(lang)).map(k =>
        java.lang.Long.parseLong(md5hex(s"$id:$k").take(12), 16)).min
      (id, lang, key)
    }.sortBy(r => (r._3, r._1)).take(200)

    val got = graft.ops.TrainingData.q129WeightedSample(spark, Sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == expected)
    // the weighting must actually bite: weight-3 languages are selected
    // at a visibly higher rate than the weight-1 majority language
    val baseRate = langs.groupMapReduce(_._2)(_ => 1.0)(_ + _)
    val selRate = got.groupMapReduce(_._2)(_ => 1.0)(_ + _)
    def rate(l: String) = selRate.getOrElse(l, 0.0) / baseRate(l)
    assert(rate("zh") > rate("en") && rate("de") > rate("en"),
      s"weighting signal absent: zh=${rate("zh")} de=${rate("de")} en=${rate("en")}")
  }

  test("q130 matches a brute-force excise→sample→split→rollup chain") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val weights = Map("en" -> 1, "fr" -> 2, "es" -> 2, "zh" -> 3, "de" -> 3)
    val langOf = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    // stage 1: raw-string segment excision (as the q123 brute force)
    val segsByDoc = docs.map { case (id, _, t) =>
      id -> t.split(" ", -1).grouped(10).map(_.mkString(" ")).toVector
    }
    val docsPerSeg = segsByDoc
      .flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupMap(_._1)(_._2).map { case (s, ids) => s -> ids.toSet }
    val cleaned = segsByDoc.flatMap { case (id, ss) =>
      val kept = ss.filter(s => docsPerSeg(s).size <= 1)
      if (kept.isEmpty) None
      else Some((id, langOf(id), kept.mkString(" ").length.toLong))
    }
    // stage 2: weighted bottom-400 by min ticket
    val sampled = cleaned.map { case (id, lang, chars) =>
      val key = (1 to weights(lang)).map(k =>
        java.lang.Long.parseLong(md5hex(s"$id:$k").take(12), 16)).min
      (id, lang, chars, key)
    }.sortBy(r => (r._4, r._1)).take(400)
    // stages 3+4: md5 split, per-(lang, split) rollup
    val expected = sampled.map { case (id, lang, chars, _) =>
      val b = Integer.parseInt(md5hex(id.toString).take(4), 16) % 100
      val split = if (b < 80) "train" else if (b < 90) "val" else "test"
      ((lang, split), (1L, chars))
    }.groupMapReduce(_._1)(_._2)((a, b) => (a._1 + b._1, a._2 + b._2))
      .toSeq.map { case ((l, s), (n, c)) => (l, s, n, c) }
      .sortBy(r => (r._1, r._2))

    val got = Corpus.q130MixPipeline(spark, Sf)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._1).distinct.size == 5 && got.map(_._3).sum == 400,
      "sample did not fill 400 docs across all languages")
  }

  test("q123 excision semantics on adversarial docs: empty text, " +
    "multi-space tokens, partial segments, intra-doc dups kept") {
    import spark.implicits._
    val w10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val x10 = (1 to 10).map(i => s"x$i").mkString(" ")
    val fixture = Seq(
      (1L, ""),                            // empty → 1 empty segment
      (2L, ""),                            // ...shared with doc 1 → both excised
      (3L, w10),                           // exactly 10 unique words
      (4L, s"$w10 tail"),                  // 11 words → partial second segment
      (5L, s"$w10 other tail words here"), // shares doc 3/4's aligned segment
      (6L, "a  b"),                        // double space → empty middle token
      (7L, "solo trailing "),              // trailing space → empty last token
      (8L, s"$x10 $x10"))                  // INTRA-doc dup only → both kept
    val dir = java.nio.file.Files.createTempDirectory("graft-q123").toString
    fixture.map { case (id, t) => (id, "en", t) }
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val segsByDoc = fixture.map { case (id, t) =>
      id -> t.split(" ", -1).grouped(10).map(_.mkString(" ")).toVector
    }
    val docsPerSeg = segsByDoc
      .flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupMap(_._1)(_._2).map { case (s, ids) => s -> ids.toSet }
    val expected = segsByDoc.map { case (id, ss) =>
      val kept = ss.filter(s => docsPerSeg(s).size <= 1)
      id -> ((ss.size.toLong, kept.size.toLong, md5hex(kept.mkString(" "))))
    }.toMap

    val got = Corpus.q123SegmentDedup(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, k, h) => id -> ((n, k, h)) }.toMap
    assert(got == expected)
    // pin the semantics the fixture was built to exercise
    assert(got(1L)._2 == 0L && got(2L)._2 == 0L,
      "shared empty segment must excise both empty docs")
    assert(got(8L) == ((2L, 2L, md5hex(s"$x10 $x10"))),
      "an INTRA-doc duplicate segment must be kept (countDistinct(doc)=1)")
    assert(got(3L)._2 == 0L && got(4L)._1 == 2L && got(4L)._2 == 1L,
      "doc 3's only segment and doc 4's first segment are cross-doc dups")
  }
}
