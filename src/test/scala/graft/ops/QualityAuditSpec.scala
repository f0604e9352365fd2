package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q191 quality audit: the full (doc, rule) table equals a driver-side
  * brute force over the raw texts (values AND verdicts), and every
  * rule has both passing and failing docs on the fixture — a rule
  * whose threshold never fires would be dead audit weight. */
class QualityAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("table equals brute force; every rule has a pass/fail mix") {
    val got = Curation.q191QualityAudit(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))

    def r4(num: Long, den: Long): Long = (2 * num * 10000 + den) / (2 * den)
    val expected = T(spark, SparkTestBase.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        if (ws.isEmpty) Seq.empty
        else {
          val n = ws.length.toLong
          val d = ws.distinct.length.toLong
          val st = ws.count(w => w == "the" || w == "a").toLong
          val chars = ws.map(_.length.toLong).sum
          Seq(
            (r.getLong(0), "min_words", n, n >= 30),
            (r.getLong(0), "stop_ratio_bp", r4(st, n), 50 * st >= n),
            (r.getLong(0), "uniq_ratio_bp", r4(d, n), 2 * d >= n),
            (r.getLong(0), "word_len_bp", r4(chars, n),
              10 * chars <= 48 * n))
        }
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected.toSeq,
      "audit table diverged from the brute force")

    val byRule = got.groupBy(_._2)
    assert(byRule.size == 4)
    byRule.foreach { case (rule, rows) =>
      assert(rows.exists(_._4) && rows.exists(!_._4),
        s"rule $rule never exercises one branch on this fixture")
    }
  }
}
