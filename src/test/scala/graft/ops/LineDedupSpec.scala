package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q295 beyond the DuckDB oracle (which states the same ownership
  * arithmetic): keep-first semantics pinned on a synthetic repetition
  * corpus — the globally FIRST occurrence of a repeated line survives
  * (in its (doc_id, position) order), every later occurrence drops,
  * including a repeat WITHIN the owner document itself; unique lines
  * pass through untouched and reassembly preserves original order.
  * Plus an independent driver-side recompute on the real corpus and
  * both-verdicts pins. */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001
  private val L = Corpus.LineLen // 8

  /** One L-token "line" of distinct tokens. */
  private def line(tag: String): String =
    (0 until L).map(i => s"$tag$i").mkString(" ")

  test("keep-first ownership: the first occurrence survives, later " +
    "occurrences drop across docs AND within the owner doc; " +
    "reassembly preserves within-doc order") {
    import spark.implicits._
    val sharedLn = line("s")
    val u1 = line("u"); val u2 = line("v"); val u3 = line("w")
    // doc 1 owns the shared line (first by (doc_id, sid)) and repeats
    // it at sid 3 — the within-doc repeat must ALSO drop
    val d1 = s"$sharedLn $u1 $sharedLn"
    // doc 2 carries it mid-document — dropped, the rest reassembles
    val d2 = s"$u2 $sharedLn $u3"
    // doc 3 is untouched
    val d3 = line("x")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = Corpus.lineDedupCore(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (1L, 3L, 2L, s"$sharedLn $u1"),
      (2L, 3L, 2L, s"$u2 $u3"),
      (3L, 1L, 1L, d3)), got)
  }

  test("a doc that is entirely repeated lines reassembles to the " +
    "empty string (never NULL)") {
    import spark.implicits._
    val ln = line("z")
    val docs = Seq((1L, ln), (2L, ln)).toDF("doc_id", "text")
    val got = Corpus.lineDedupCore(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq((1L, 1L, ln), (2L, 0L, "")), got)
  }

  test("q295 equals an independent keep-first recompute on the real " +
    "corpus; both verdicts fire") {
    import spark.implicits._
    val raw = T(spark, dir, "documents").select("doc_id", "text")
      .as[(Long, String)].collect()
    // independent recompute on raw segment TEXT (no md5 — a digest
    // collision in the graded plan would surface as a diff here)
    val segs = raw.flatMap { case (doc, text) =>
      val w = text.split(" ")
      (0 until (w.length + L - 1) / L).map { i =>
        (doc, i + 1, w.slice(i * L, (i + 1) * L).mkString(" "))
      }
    }
    val multi = segs.groupBy(_._3).filter(_._2.length >= 2)
      .map { case (g, rows) => g -> rows.map(t => (t._1, t._2)).min }
    val want = raw.map { case (doc, text) =>
      val w = text.split(" ")
      val ls = (0 until (w.length + L - 1) / L)
        .map(i => (i + 1, w.slice(i * L, (i + 1) * L).mkString(" ")))
      val kept = ls.filter { case (sid, g) =>
        multi.get(g).forall(_ == (doc, sid))
      }
      (doc, ls.length.toLong, kept.length.toLong,
        kept.map(_._2).mkString(" "))
    }.toSet
    val got = graft.SparkEntry.queries("q295_line_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == want)
    assert(got.exists(t => t._2 > t._3), "nothing dropped — degenerate")
    assert(got.exists(t => t._2 == t._3), "everything dropped — degenerate")
  }

  test("q304 accounts exactly the q295 rewrite's survivors per " +
    "language; some language genuinely loses tokens") {
    val meta = T(spark, dir, "documents")
      .selectExpr("doc_id", "lang", "size(split(text, ' ')) as n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    val cleaned = graft.SparkEntry.queries("q295_line_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3))
    val want = cleaned.groupBy(t => meta(t._1)._1).map { case (lang, g) =>
      val raw = g.map(t => meta(t._1)._2.toLong).sum
      val kept = g.map { case (_, txt) =>
        if (txt.isEmpty) 0L else txt.split(" ").length.toLong }.sum
      lang -> (g.length.toLong, raw, kept, kept * 10000 / raw)
    }
    val got = graft.SparkEntry.queries("q304_dedup_accounting")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == want, "accounting diverged from the graded rewrite")
    assert(got.values.exists(t => t._3 < t._2),
      "no language lost tokens — degenerate")
  }
}
