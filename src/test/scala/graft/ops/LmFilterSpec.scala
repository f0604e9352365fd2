package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q271 (LM quality filter), q272 (link prediction) and q273 (UoM
  * rollup) beyond their DuckDB oracles: independent driver-side
  * recomputes plus the semantic pins — reference-slice docs are never
  * OOV while off-reference OOV genuinely fires, hub truncation is
  * load-bearing, mixed units genuinely inflate the base quantity. */
class LmFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001


  test("q271 equals the driver-side bigram model walk; en docs are " +
    "never OOV, off-reference OOV and both verdicts fire") {
    val docs = T(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(' ').filter(_.nonEmpty).toSeq))
      .filter(_._3.length >= 2)
    def bigrams(w: Seq[String]): Seq[(String, String)] =
      w.sliding(2).map(p => (p(0), p(1))).toSeq
    val refBg = docs.filter(_._2 == "en").flatMap(d => bigrams(d._3))
    val c2 = refBg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = refBg.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val model: Map[(String, String), Long] =
      c2.map { case (k, n2) => k -> (bitlen(c1(k._1)) - bitlen(n2)) }
    val want = docs.map { case (id, lang, w) =>
      val bs = bigrams(w)
      val n = bs.length.toLong
      val oov = bs.count(b => !model.contains(b)).toLong
      val bits = bs.map(b => model.getOrElse(b, Corpus.OovBits)).sum
      val score = bits * 10000 / n
      (id, lang, n, oov, score, score <= Corpus.LmKeepX1e4)
    }
    val got = graft.SparkEntry.queries("q271_lm_quality_filter")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toMap
    assert(got.keySet == want.map(_._1).toSet)
    want.foreach { case (id, _, n, oov, score, keep) =>
      assert(got(id) == ((n, oov, score, keep)), s"doc $id diverged")
    }
    // reference-slice docs can never be OOV (their bigrams ARE the model)
    assert(want.filter(_._2 == "en").forall(_._4 == 0),
      "an en doc scored OOV against its own training slice")
    // ... but the backoff genuinely fires somewhere off-reference
    assert(want.exists(d => d._2 != "en" && d._4 > 0),
      "no off-reference OOV — the backoff path is untested")
    assert(want.exists(_._6) && want.exists(!_._6),
      "the keep threshold never splits the population")
  }

  test("q272 equals the driver-side truncated common-neighbor walk; " +
    "truncation is load-bearing and weights use the FULL degree") {
    val pairs = T(spark, dir, "lineitem").select("l_orderkey", "l_suppkey")
      .join(T(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .collect().map(r => (r.getLong(1), r.getLong(3)))
      .groupBy(identity).map { case ((sk, ck), v) => (sk, ck, v.size.toLong) }
      .toSeq
    def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val bySupp = pairs.groupBy(_._1)
    val wt = bySupp.map { case (sk, cs) =>
      sk -> 1048576L / bitlen(cs.size.toLong) }
    val scored = bySupp.toSeq.flatMap { case (sk, cs) =>
      val top = cs.sortBy(c => (-c._3, c._2)).take(Graph.LinkTopNbr).map(_._2)
      for (c1 <- top; c2 <- top if c1 < c2) yield ((c1, c2), wt(sk))
    }.groupBy(_._1)
      .map { case (k, vs) => (k._1, k._2, vs.size.toLong, vs.map(_._2).sum) }
      .toSeq
      .sortBy { case (c1, c2, _, sc) => (-sc, c1, c2) }
      .take(Graph.LinkTopK)
    val got = graft.SparkEntry.queries("q272_link_predict")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == scored)
    // truncation must actually truncate: some supplier has more
    // customers than the cap, or the d² bound is untested
    assert(bySupp.values.exists(_.size > Graph.LinkTopNbr),
      "no supplier exceeds the neighbor cap — truncation untested")
    // the weight reflects the FULL degree: some supplier's degree
    // exceeds the cap, so its weight differs from the capped weight
    assert(bySupp.exists { case (sk, cs) =>
      cs.size > Graph.LinkTopNbr &&
        wt(sk) != 1048576L / bitlen(Graph.LinkTopNbr.toLong) },
      "every weight equals the capped-degree weight — full degree unused")
  }

  test("q273 equals the driver-side conversion walk; every unit fires " +
    "and mixed units genuinely inflate the base quantity") {
    val parts = T(spark, dir, "part").select("p_partkey", "p_brand")
      .collect().map { r =>
        val pk = r.getLong(0)
        val tk = SparkTestBase.md5Long(s"uomp:$pk", 12)
        pk -> (r.getString(1), 2 + tk % 9, 4 + (tk / 10) % 5)
      }.toMap
    val lines = T(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        expr("cast(l_quantity as bigint)"),
        expr("cast(round(l_extendedprice * 100) as bigint)"))
      .collect().map { r =>
        val (brand, box, pal) = parts(r.getLong(0))
        val u = SparkTestBase.md5Long(s"uoml:${r.getLong(1)}:${r.getInt(2)}", 12) % 10
        val qty = r.getLong(3)
        val uom = if (u <= 6) "EA" else if (u <= 8) "BOX" else "PAL"
        val base = if (u <= 6) qty else if (u <= 8) qty * box
          else qty * box * pal
        (brand, uom, qty, base, r.getLong(4))
      }
    val want = lines.groupBy(_._1).map { case (b, rs) =>
      b -> (rs.length.toLong,
        rs.filter(_._2 == "EA").map(_._3).sum,
        rs.filter(_._2 == "BOX").map(_._3).sum,
        rs.filter(_._2 == "PAL").map(_._3).sum,
        rs.map(_._4).sum, rs.map(_._5).sum) }
    val got = graft.SparkEntry.queries("q273_uom_rollup")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == want)
    assert(lines.exists(_._2 == "EA") && lines.exists(_._2 == "BOX") &&
      lines.exists(_._2 == "PAL"), "a unit never fires — weak fixture")
    // the conversion is load-bearing: base exceeds raw wherever any
    // box/pallet line exists (box_ea >= 2, pal_box >= 4 by derivation)
    got.foreach { case (b, (_, ea, box, pal, base, _)) =>
      val raw = want(b)
      if (box + pal > 0)
        assert(base > ea + box + pal, s"brand $b conversion did not inflate")
      else assert(base == ea, s"brand $b pure-EA base mismatch")
    }
  }
}
