package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q297 beyond the DuckDB oracle (which states the same integer
  * chains): 2U re-derived brute-force from cross-pairs on the real
  * corpus (wins doubled + ties — no midranks), a shifted synthetic
  * cohort that must fire the alarm with the right SIGN, a tie-heavy
  * fixture exercising the tie_q correction, and silence on the real
  * stationary split. */
class MwuDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def core(counts: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    Corpus.mwuCore(counts.toDF("n_chars", "c1", "c2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).head
  }

  test("q297's 2U equals the brute-force doubled pair count on the " +
    "real corpus; the real split is stationary (no alarm)") {
    val vals = T(spark, dir, "documents")
      .selectExpr("n_chars", "doc_id % 2 as g")
      .where("n_chars is not null")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = vals.filter(_._2 == 0L).map(_._1)
    val b = vals.filter(_._2 != 0L).map(_._1)
    var u2 = 0L
    for (x <- a; y <- b) {
      if (x > y) u2 += 2 else if (x == y) u2 += 1
    }
    val got = graft.SparkEntry.queries("q297_mwu_drift")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(6))).head
    assert(got._1 == a.length.toLong && got._2 == b.length.toLong)
    assert(got._3 == u2, s"2U mismatch: got ${got._3}, brute $u2")
    assert(got._4 == u2 - a.length.toLong * b.length)
    assert(!got._5, "stationary parity split flagged as drifted")
  }

  test("a shifted cohort fires the alarm with the right sign; a " +
    "mirrored shift flips the sign") {
    // cohort 1 at values 1..40, cohort 2 at 41..80 — total separation
    val up = (1L to 40L).map(v => (v, 1L, 0L)) ++
      (41L to 80L).map(v => (v, 0L, 1L))
    val (n1, n2, u2, dev, _, z2, drifted) = core(up)
    assert((n1, n2) == (40L, 40L))
    assert(u2 == 0L && dev == -(40L * 40L), "cohort 1 never wins")
    assert(drifted && z2 > 4, s"total separation must alarm (z2=$z2)")
    val (_, _, u2m, devm, _, _, driftedm) = core(up.map {
      case (v, c1, c2) => (v, c2, c1) })
    assert(u2m == 2L * 40L * 40L && devm == 40L * 40L && driftedm,
      "mirrored shift must alarm with positive dev")
  }

  test("tie-heavy data engages the tie_q variance correction") {
    // everything at one value: all ties — 2U = n1·n2 exactly, dev = 0,
    // T = N³−N makes tie_q = N+1, and the guarded z² stays 0
    val allTies = Seq((7L, 30L, 30L))
    val (_, _, u2, dev, tieQ, z2, drifted) = core(allTies)
    assert(u2 == 900L && dev == 0L)
    assert(tieQ == 61L, s"T=(N³−N) over N(N−1) must be N+1=61, got $tieQ")
    assert(z2 == 0L && !drifted)
    // mixed: half the mass tied at one value, half spread — tie_q
    // strictly between 0 and N+1
    val mixed = Seq((1L, 15L, 15L)) ++ (2L to 16L).map(v => (v, 1L, 1L))
    val (_, _, _, _, tq, _, _) = core(mixed)
    assert(tq > 0L && tq < 61L, s"partial ties: 0 < tie_q < N+1, got $tq")
  }
}
