package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q163 (Misra–Gries heavy hitters) beyond the DuckDB oracle: the
  * superset guarantee on adversarial streams, merge-order invariance
  * of the FINAL (verified) result, and equality with the exact
  * brute-force heavy set on real data.
  */
class MgSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Drives the raw sketch over a stream with a given partitioning. */
  private def sketch(stream: Seq[String], k: Int,
                     parts: Int): Seq[String] = {
    import spark.implicits._
    val mg = org.apache.spark.sql.functions.udaf(new MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    stream.toDF("word").repartition(parts)
      .agg(mg(org.apache.spark.sql.functions.col("word")))
      .head.getSeq[String](0)
  }

  test("superset guarantee: every item with count > N/(k+1) survives " +
    "the sketch on random and adversarial streams, at any partitioning") {
    val rnd = new scala.util.Random(7)
    val streams = Seq(
      // zipf-ish random stream
      Seq.fill(3000)("w" + math.min(rnd.nextInt(400), rnd.nextInt(400))),
      // adversarial: one giant run then distinct chaff
      Seq.fill(500)("hot") ++ (1 to 2500).map("c" + _),
      // chaff first, heavy last (eviction pressure before the heavy)
      (1 to 2500).map("c" + _) ++ Seq.fill(500)("hot"))
    for (stream <- streams; k <- Seq(8, 64); parts <- Seq(1, 7)) {
      val n = stream.length
      val counts = stream.groupBy(identity).view.mapValues(_.size).toMap
      val mustSurvive = counts.filter(_._2 > n / (k + 1)).keySet
      val got = sketch(stream, k, parts).toSet
      assert(mustSurvive.subsetOf(got),
        s"k=$k parts=$parts lost ${mustSurvive -- got}")
      assert(got.size <= k)
    }
  }

  test("q163 equals the exact brute-force heavy set on sf0.001 and is " +
    "invariant to input partitioning") {
    val dir = "/root/testdata/sf0.001"
    val toks = T(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "filter(split(text, ' '), x -> x != '')")).as("w"))
      .collect().map(_.getString(0))
    val n = toks.length
    val expect = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * SketchRollup.HeavyDenom >= n }
      .toMap
    val got = SketchRollup.q163HeavyHitters(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(got.nonEmpty, "degenerate fixture: no heavy hitters")
    // ordering contract: cnt desc, word asc
    val rows = SketchRollup.q163HeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.sortBy { case (w, c) => (-c, w) }.toSeq == rows.toSeq)
  }
}
