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
}
