package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q150/q151 (token-budget mixture cut): the scale claim is that the
  * per-language exclusive prefix sum runs as a GLOBAL two-pass scan
  * over the composite (lang, skey, doc_id) key — never a per-lang
  * window that puts one language's whole corpus slice in one task.
  * The spec pins equality against exactly that naive per-lang window
  * formulation (a different Spark plan), the maximal-prefix property
  * the budget semantics promise, and — r10 — that the per-language
  * budget table actually differentiates languages and that the
  * subword-denominated q151 differs from the whitespace q150. */
class MixBudgetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  private val wsTok: Column =
    size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")

  private def keyed(tok: Column) = T(spark, Sf, "documents")
    .select(col("doc_id"), col("lang"), tok.as("tok"),
      expr("cast(conv(substring(md5(concat('mix:', " +
        "cast(doc_id as string))), 1, 12), 16, 10) as bigint)").as("skey"))

  /** The naive formulation: per-lang window + literal budget map. */
  private def naive(tok: Column): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    val w = Window.partitionBy("lang").orderBy("skey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgets = TrainingData.LangBudgets.toDF("b_lang", "budget")
    keyed(tok)
      .withColumn("lang_excl", coalesce(sum("tok").over(w), lit(0L)))
      .join(budgets, col("lang") === col("b_lang"))
      .filter(col("lang_excl") < col("budget"))
      .select("lang", "doc_id", "tok", "lang_excl")
      .orderBy("lang", "lang_excl", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
  }

  test("q150 equals the naive per-lang window formulation") {
    import spark.implicits._
    val got = TrainingData.q150TokenBudgetMix(spark, Sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == naive(wsTok))
    assert(got.map(_._1).distinct.size > 1, "single-lang fixture — weak")
  }

  test("q151 equals the naive formulation under the subword contract " +
    "and differs from q150") {
    import spark.implicits._
    val got = TrainingData.q151BpeBudgetMix(spark, Sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == naive(graft.functions.Bpe.count(col("text"))))
    val q150 = TrainingData.q150TokenBudgetMix(spark, Sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)).toSet != q150.map(r => (r._1, r._2)).toSet,
      "subword budgets admit the same doc set as whitespace — vocab degenerate")
  }

  test("per language: the kept set is the maximal shuffled-order prefix " +
    "with exclusive token sum under ITS budget, and budgets differentiate") {
    import spark.implicits._
    val budgets = TrainingData.LangBudgets.toMap
    assert(budgets.values.toSet.size > 1,
      "all languages share one budget — the r9 flag this table exists to fix")
    val all = keyed(wsTok).as[(Long, String, Long, Long)].collect()
      .map { case (id, lang, tok, skey) => (lang, skey, id, tok) }
      .groupBy(_._1)
    val kept = TrainingData.q150TokenBudgetMix(spark, Sf)
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var anyCut = false
    for ((lang, docs) <- all) {
      val budget = budgets.getOrElse(lang,
        fail(s"corpus lang $lang missing from LangBudgets"))
      val ordered = docs.sortBy(d => (d._2, d._3))
      var acc = 0L
      val expect = scala.collection.mutable.Set[Long]()
      for ((_, _, id, tok) <- ordered) {
        if (acc < budget) expect += id
        acc += tok
      }
      assert(kept.getOrElse(lang, Set.empty) == expect.toSet,
        s"$lang: kept set is not the maximal under-budget prefix")
      if (expect.size < ordered.size) anyCut = true
    }
    assert(anyCut, "budget never binds at sf0.001 — raise/lower it")
  }
}
