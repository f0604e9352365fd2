package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q224 (corpus release gate) beyond the DuckDB oracle (same integer
  * formulation): a driver-side brute force of every check from raw
  * rows (md5 via MessageDigest — independent of both engines), the
  * composition contract (the gate's drift row IS q219's own output),
  * and the genuine-verdict-mix bar (a gate whose fail path never fires
  * is untested). */
class CorpusGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val got: Map[String, (Long, Long, Boolean)] =
    Corpus.q224CorpusGate(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("q224 equals the driver-side brute force on every corpus check") {
    // mirror the op's NULL-text exclusion (q223's weight contract)
    val rows = T(spark, dir, "documents").select("text", "lang").collect()
      .filter(!_.isNullAt(0))
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toLong
    val nd = rows.map(r => md5hex(r._1)).distinct.length.toLong
    val nl = rows.map(_._2).distinct.length.toLong
    val wordCounts = rows.map(_._1.split(" ").count(_.nonEmpty).toLong)
    val npass = wordCounts.count(_ >= 30L).toLong
    val ntok = wordCounts.sum

    assert(got("a_min_docs") == ((n, 100L, n >= 100L)))
    val dup = (n - nd) * 10000L / n
    assert(got("b_dup_rate_bp") == ((dup, 100L, dup <= 100L)))
    assert(got("c_lang_coverage") == ((nl, 3L, nl >= 3L)))
    val q = npass * 10000L / n
    assert(got("d_quality_share_bp") == ((q, 8000L, q >= 8000L)))
    assert(got("f_token_budget") == ((ntok, 100000L, ntok >= 100000L)))
    assert(got.size == 6)
  }

  test("the drift row IS q219's own output, and both verdicts fire") {
    val d = Corpus.q219KsDrift(spark, dir).collect()(0).getLong(3)
    assert(got("e_ks_drift_bp") == ((d, 2000L, d <= 2000L)))
    assert(got.values.exists(_._3), s"no passing check: $got")
    assert(got.values.exists(!_._3), s"no failing check: $got")
    got.foreach { case (c, (_, _, _)) => assert(c.length > 2, c) }
  }
}
