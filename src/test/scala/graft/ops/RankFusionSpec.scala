package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q209 (hybrid-retrieval RRF) beyond the DuckDB oracle (which reruns
  * the same two retrievers): an independent driver-side Jaccard
  * retriever (character code, no Spark expressions), the RRF recompute
  * from the lists, and the properties that make fusion load-bearing —
  * the two lists genuinely disagree, and single-list documents fuse
  * through the coalesce path. */
class RankFusionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val fused = TrainingData.q209RankFusion(spark, dir).collect()
    .map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      r.getLong(3)))

  /** Independent Jaccard top-50: plain Scala sets over the raw text. */
  private lazy val jacList: Seq[(Long, Long)] = {
    val qg = TrainingData.fusionQueryGrams.toSet
    T(spark, dir, "documents").select("doc_id", "text").collect()
      .filter(_.getString(1).length >= 3)
      .map { r =>
        val g = r.getString(1).sliding(3).toSet
        val i = (g & qg).size
        (r.getLong(0), i.toDouble / (g.size + qg.size - i))
      }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(50).zipWithIndex.map { case ((id, _), i) => (id, (i + 1).toLong) }
      .toSeq
  }

  test("the Jaccard ranks inside q209 equal the independent set-based " +
    "retriever, and RRF recomputes from the two lists") {
    val jacByDoc = jacList.toMap
    fused.foreach { case (doc, _, jr, _) =>
      assert(jr == jacByDoc.get(doc), s"doc $doc jac rank")
    }
    fused.foreach { case (doc, br, jr, rrf) =>
      val exp = br.map(r => 10000000L / (60 + r)).getOrElse(0L) +
        jr.map(r => 10000000L / (60 + r)).getOrElse(0L)
      assert(rrf == exp, s"doc $doc rrf")
      assert(br.isDefined || jr.isDefined, s"doc $doc in neither list")
    }
    assert(fused.length == 20)
    // descending with doc_id tiebreak
    assert(fused.map(f => (-f._4, f._1)).toSeq ==
      fused.map(f => (-f._4, f._1)).toSeq.sorted)
  }

  test("fusion is load-bearing: the retrievers disagree and at least " +
    "one fused doc was retrieved by only one list") {
    val bmDocs = fused.flatMap(f => f._2.map(_ => f._1)).toSet
    val jacDocs = jacList.map(_._1).toSet
    assert((bmDocs -- jacDocs).nonEmpty || fused.exists(_._3.isEmpty),
      "every BM25 doc also in the Jaccard list at the same depth — " +
        "fixture degenerate for the coalesce path")
    assert(fused.exists(f => f._2.isEmpty || f._3.isEmpty),
      "no single-list doc survived to the fused top-20")
    // fused order is not just one list's order
    val bmOrder = fused.flatMap(f => f._2.map(r => (r, f._1))).sortBy(_._1)
    assert(bmOrder.map(_._2).toSeq != fused.map(_._1).toSeq,
      "fused top-20 is exactly the BM25 list — second signal inert")
  }

  test("the fused plan is rank-list-sized: no window, no corpus join " +
    "above the two TakeOrdered collects") {
    val plan = TrainingData.q209RankFusion(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("parquet"),
      s"fusion plan rescans the corpus:\n$plan")
  }
}
