package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q162 (BPE merge training) — the no-oracle evidence: an independent
  * driver-side reference trainer must reproduce the whole merge table,
  * hand-computed fixtures pin the greedy non-overlap application, and
  * the max-pair frequency must be non-increasing (a merged pair's
  * derivatives can never outnumber it).
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Reference: sequential BPE training over a word-frequency map. */
  private def refTrain(words: Map[String, Long],
                       m: Int): Seq[(Int, String, String, Long)] = {
    def apply1(syms: Vector[String], a: String,
               b: String): Vector[String] = {
      val buf = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += syms(i); i += 1 }
      }
      buf.result()
    }
    var ws = words.toVector.map { case (w, n) =>
      (w.map(_.toString).toVector, n)
    }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to m) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- ws; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) =
          pc.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (pc.nonEmpty) {
        val ((a, b), f) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((rank, a, b, f))
        ws = ws.map { case (syms, n) => (apply1(syms, a, b), n) }
      }
    }
    out.result()
  }

  private def run(words: Map[String, Long], m: Int) = {
    import spark.implicits._
    BpeTrain.trainMergesFrom(words.toSeq.toDF("word", "n"), m)
  }

  test("hand-computed: greedy non-overlap — 'aaaa' merges to [aa, aa], " +
    "never [aa, a, a]") {
    val got = run(Map("aaaa" -> 1L), 3)
    assert(got == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("hand-computed: frequency argmax with deterministic tie-break " +
    "and merge exhaustion below the requested count") {
    assert(run(Map("ab" -> 3L), 4) == Seq((1, "a", "b", 3L)))
    // (a,a):4 vs (a,b):5 -> (a,b) first; then the (a,a)/(a,ab) tie
    // breaks toward the lexicographically smaller right symbol
    val got = run(Map("aaab" -> 2L, "ab" -> 3L), 2)
    assert(got.head == ((1, "a", "b", 5L)))
    assert(got(1) == ((2, "a", "a", 2L)))
  }

  test("q162 equals the independent reference trainer on sf0.001 and " +
    "merge frequencies are non-increasing") {
    val dir = "/root/testdata/sf0.001"
    val words = T(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "filter(split(text, ' '), x -> x != '')")).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val expect = refTrain(words, BpeTrain.Merges)
    val got = BpeTrain.q162BpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
    assert(got.size == BpeTrain.Merges)
    got.map(_._4).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"freq increased: $got")
      case _ =>
    }
  }
}
