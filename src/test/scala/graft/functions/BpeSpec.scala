package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the [[Bpe]] subword tokenizer contract: greedy longest-match
  * against the fixed merged vocab, one-char fallback, id scheme, and
  * exact agreement between the codegen'd expressions and an
  * independently-written reference matcher on the real corpus. The
  * DuckDB oracle twin (recursive CTE from the same vocab constant) is
  * exercised end-to-end by q84/q151's CORRECTNESS rows. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Independent reference: same contract, different code shape. */
  private def refTokens(t: String): Seq[Int] = {
    val vset = Bpe.vocab.zipWithIndex.toMap
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var pos = 0
    while (pos < t.length) {
      val cand = (1 to math.min(6, t.length - pos))
        .map(l => t.substring(pos, pos + l))
        .filter(vset.contains)
      if (cand.nonEmpty) {
        val best = cand.maxBy(_.length)
        out += Bpe.VocabBase + vset(best)
        pos += best.length
      } else {
        out += t.charAt(pos).toInt
        pos += 1
      }
    }
    out.toSeq
  }

  private def vid(tok: String): Int = Bpe.VocabBase + Bpe.vocab.indexOf(tok)

  test("hand-computed examples: merges, splits, doc-initial, fallback") {
    import spark.implicits._
    val rows = Seq(
      // document-initial word matches the BARE variant
      "the table" -> Seq(vid("the"), vid(" table")),
      // deliberately-split words: 2 subwords each
      "customer" -> Seq(vid("cust"), vid("omer")),
      "a customer stream" -> Seq(vid("a"), vid(" cust"), vid("omer"),
        vid(" str"), vid("eam")),
      // out-of-vocab characters fall back to one token per char
      "xy" -> Seq('x'.toInt, 'y'.toInt),
      // greedy prefers " agg" (4) over " a" (2)
      "x agg" -> Seq('x'.toInt, vid(" agg")),
      "" -> Seq.empty[Int])
    val got = rows.map(_._1).toDF("text")
      .select(Bpe.tokens(col("text")).as("t"), Bpe.count(col("text")).as("c"))
      .as[(Seq[Int], Long)].collect()
    rows.zip(got).foreach { case ((text, expect), (toks, cnt)) =>
      assert(toks == expect, s"tokens for '$text'")
      assert(cnt == expect.size.toLong, s"count for '$text'")
    }
  }

  test("corpus parity: expressions agree with the reference matcher " +
    "and count == tokens length") {
    import spark.implicits._
    val rows = graft.ops.T(spark, SparkTestBase.Sf0001, "documents")
      .select(col("text"), Bpe.tokens(col("text")).as("t"),
        Bpe.count(col("text")).as("c"))
      .as[(String, Seq[Int], Long)].collect()
    assert(rows.length > 100)
    rows.foreach { case (text, toks, cnt) =>
      assert(toks == refTokens(text))
      assert(cnt == toks.size.toLong)
    }
    // subword counts genuinely differ from the whitespace contract
    val differs = rows.count { case (text, toks, _) =>
      toks.size != text.split(" ").count(_.nonEmpty)
    }
    assert(differs > 0, "vocab degenerate: bpe == whitespace everywhere")
  }

  test("SQL registration and null propagation") {
    import spark.implicits._
    graft.GraftExtensions.register(
      spark.sessionState.functionRegistry)
    val r = spark.sql(
      "SELECT bpe_count('the table'), size(bpe_tokens('customer')), " +
        "bpe_count(CAST(NULL AS STRING))")
      .as[(Long, Int, Option[Long])].head()
    assert(r == ((2L, 2, None)))
  }
}
