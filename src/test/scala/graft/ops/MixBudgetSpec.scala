package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q150 (token-budget mixture cut): the scale claim is that the
  * per-language exclusive prefix sum runs as a GLOBAL two-pass scan
  * over the composite (lang, skey, doc_id) key — never a per-lang
  * window that puts one language's whole corpus slice in one task.
  * The spec pins equality against exactly that naive per-lang window
  * formulation (a different Spark plan), plus the maximal-prefix
  * property the budget semantics promise. */
class MixBudgetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  private def keyed = T(spark, Sf, "documents")
    .select(col("doc_id"), col("lang"),
      size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")
        .as("tok"),
      expr("cast(conv(substring(md5(concat('mix:', " +
        "cast(doc_id as string))), 1, 12), 16, 10) as bigint)").as("skey"))

  test("q150 equals the naive per-lang window formulation") {
    import spark.implicits._
    val w = Window.partitionBy("lang").orderBy("skey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = keyed
      .withColumn("lang_excl", coalesce(sum("tok").over(w), lit(0L)))
      .filter(col("lang_excl") < 4000L)
      .select("lang", "doc_id", "tok", "lang_excl")
      .orderBy("lang", "lang_excl", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    val got = TrainingData.q150TokenBudgetMix(spark, Sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == naive)
    assert(got.map(_._1).distinct.size > 1, "single-lang fixture — weak")
  }

  test("per language: the kept set is the maximal shuffled-order prefix " +
    "with exclusive token sum under budget, and the cut actually binds") {
    import spark.implicits._
    val all = keyed.as[(Long, String, Long, Long)].collect()
      .map { case (id, lang, tok, skey) => (lang, skey, id, tok) }
      .groupBy(_._1)
    val kept = TrainingData.q150TokenBudgetMix(spark, Sf)
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var anyCut = false
    for ((lang, docs) <- all) {
      val ordered = docs.sortBy(d => (d._2, d._3))
      var acc = 0L
      val expect = scala.collection.mutable.Set[Long]()
      for ((_, _, id, tok) <- ordered) {
        if (acc < 4000L) expect += id
        acc += tok
      }
      assert(kept.getOrElse(lang, Set.empty) == expect.toSet,
        s"$lang: kept set is not the maximal under-budget prefix")
      if (expect.size < ordered.size) anyCut = true
    }
    assert(anyCut, "budget never binds at sf0.001 — raise/lower it")
  }
}
