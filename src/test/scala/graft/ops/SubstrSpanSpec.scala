package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q294 beyond the DuckDB oracle (which states the same lag-based
  * island merge): the span-merge ALGEBRA pinned case-by-case on a
  * synthetic fixture — overlapping hits merge, adjacent hits merge, a
  * gap of one token breaks, multiple disjoint spans per doc survive —
  * plus an independent brute-force recompute of the graded frame
  * (collect the duplicated positions, merge them imperatively, compare
  * extents) and both-verdicts pins on the real corpus. */
class SubstrSpanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val K = Corpus.SpanK // 8

  /** Distinct filler tokens f<i>0..f<i>N — never repeated across docs,
    * so they can't create accidental duplicate shingles. */
  private def filler(tag: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"f$tag<$i>")

  /** The shared K+2-token phrase both fixture docs carry — long enough
    * for three overlapping K-shingles. */
  private val shared: Seq[String] = (0 until K + 2).map(i => s"dup$i")

  test("span merge algebra: overlapping hits merge into one extent, a " +
    "gap breaks, disjoint spans coexist in one doc, clean docs emit " +
    "nothing") {
    import spark.implicits._
    // doc 1: [shared][5 filler][shared] — two disjoint duplicated spans
    //        (gap 5 > 0), each an internally MERGED run of 3 overlapping
    //        hits (K+2 tokens ⇒ hits at pos p, p+1, p+2)
    // doc 2: [3 filler][shared] — one span, offset from doc 1's
    // doc 3: pure filler — no spans at all
    val d1 = shared ++ filler(1, 5) ++ shared
    val d2 = filler(2, 3) ++ shared
    val d3 = filler(3, 2 * K)
    val docs = Seq(
      (1L, d1.mkString(" ")), (2L, d2.mkString(" ")), (3L, d3.mkString(" ")))
      .toDF("doc_id", "text")
    val got = Corpus.dupSpanCore(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    // doc 1: spans [1, K+2] and [K+8, 2K+9] (1-based token positions);
    // each merges 3 hits. doc 2: one span [4, K+5], 3 hits. doc 3: none.
    val s2 = (K + 2 + 5 + 1).toLong // second span's start in doc 1
    assert(got == Seq(
      (1L, 1L, (K + 2).toLong, (K + 2).toLong, 3L),
      (1L, s2, s2 + K + 1, (K + 2).toLong, 3L),
      (2L, 4L, (K + 5).toLong, (K + 2).toLong, 3L)), got)
  }

  test("exact merge boundary: hits K apart (adjacent extents) merge " +
    "into one span; hits K+1 apart (a single unique token between " +
    "extents) break into two") {
    import spark.implicits._
    val a = (0 until K).map(i => s"a$i")
    val b = (0 until K).map(i => s"b$i")
    // doc 1: [a][b] — hits at pos 1 and K+1, extents [1,K] ∪ [K+1,2K]
    //        touch ⇒ ONE merged [1, 2K] span
    // doc 4: [a][one unique token][b] — hits at 1 and K+2 ⇒ extents
    //        [1,K] and [K+2,2K+1] leave token K+1 unique ⇒ TWO spans
    // docs 2/3/5: the other carriers making a and b cross-doc dups
    val docs = Seq(
      (1L, (a ++ b).mkString(" ")),
      (2L, (a ++ filler(4, 3)).mkString(" ")),
      (3L, (b ++ filler(5, 3)).mkString(" ")),
      (4L, (a ++ Seq("lonely") ++ b).mkString(" "))).toDF("doc_id", "text")
    val got = Corpus.dupSpanCore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.filter(_._1 == 1L).toSeq == Seq((1L, 1L, 2L * K)), got.toSeq)
    assert(got.filter(_._1 == 4L).toSeq ==
      Seq((4L, 1L, K.toLong), (4L, (K + 2).toLong, (2L * K) + 1)), got.toSeq)
  }

  test("q294 equals a brute-force driver-side merge of the duplicated " +
    "positions on the real corpus; both verdicts fire") {
    import spark.implicits._
    val docs = T(spark, dir, "documents").select("doc_id", "text")
    // independent recompute: shingle → cross-doc df — no md5, so a
    // digest collision in the graded plan would also surface here
    val sh = docs.collect().flatMap { r =>
      val w = r.getString(1).split(" ")
      (0 to w.length - K).map(i => (r.getLong(0), i + 1, w.slice(i, i + K).mkString(" ")))
    }
    val byDocCount = sh.groupBy(_._3).map { case (g, rows) =>
      g -> rows.map(_._1).distinct.length
    }
    val want = sh.filter(t => byDocCount(t._3) >= 2)
      .groupBy(_._1).flatMap { case (doc, rows) =>
        val ps = rows.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
        ps.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2 + 1) {
            val (s0, _, n) = spans.last
            spans(spans.length - 1) = (s0, p + K - 1, n + 1)
          } else spans += ((p, p + K - 1, 1))
        }
        spans.map(t => (doc, t._1.toLong, t._2.toLong, t._3.toLong))
      }.toSet
    val got = graft.SparkEntry.queries("q294_dup_spans")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty, "no duplicated spans at sf0.001 — fixture degenerate")
    val flagged = got.map(_._1)
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert((all -- flagged).nonEmpty, "every doc flagged — degenerate")
    assert(got.exists(_._4 > 1), "no merged multi-hit span — merge untested")
  }

  test("q305 excision cuts exactly q294's extents: n_kept = n_tokens " +
    "− Σ span_tokens per doc, the reassembly equals the positional " +
    "filter, and clean docs pass through verbatim") {
    val spans = graft.SparkEntry.queries("q294_dup_spans")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val raw = T(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.SparkEntry.queries("q305_span_excision")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got.keySet == raw.keySet, "excision dropped or invented docs")
    got.foreach { case (doc, (nTok, nKept, clean)) =>
      val w = raw(doc).split(" ")
      assert(nTok == w.length.toLong)
      spans.get(doc) match {
        case None =>
          assert(clean == raw(doc), s"doc $doc rewritten without spans")
        case Some(sp) =>
          // merged extents are disjoint, so the cut size is the exact sum
          assert(nKept == nTok - sp.map(_._4).sum,
            s"doc $doc kept-count != tokens minus span mass")
          val keep = w.indices.filter { i0 =>
            !sp.exists(s => i0 + 1 >= s._2 && i0 + 1 <= s._3) }
          assert(clean == keep.map(w).mkString(" "),
            s"doc $doc reassembly diverged from the positional filter")
      }
    }
    assert(got.values.exists(t => t._2 == 0L),
      "no fully-excised doc (whole-doc dups exist here) — degenerate")
  }
}
