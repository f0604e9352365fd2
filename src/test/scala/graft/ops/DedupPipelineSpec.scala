package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q310 — the composed dedup flagship. Two obligations beyond the
  * DuckDB hash gate:
  *
  *  1. SEMANTICS: an independent plain-Scala brute force of the whole
  *     chain (span detection → excision → keep-first line dedup →
  *     accounting) on the real sf0.001 corpus must reproduce the graded
  *     frame exactly — the composition can't silently diverge from the
  *     q294/q305/q295/q304 semantics it claims to fuse.
  *  2. PLAN: the composition's point is SHARED EXCHANGES — the
  *     positioned-shingle repartition and the line-key repartition must
  *     each materialize ONCE (a ReusedExchange feeding the second
  *     consumer), which is exactly what the canonical-identity moves in
  *     [[Corpus.q310Excised]] exist for. If an optimizer change
  *     re-specializes one branch, this fails loudly instead of silently
  *     doubling the biggest shuffle.
  */
class DedupPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private val K = 8 // SpanK — shared constant, asserted below
  private val L = 8 // LineLen

  test("shared constants still match the ops under test") {
    assert(Corpus.SpanK == K && Corpus.LineLen == L)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q310 equals a plain-Scala brute force of the full chain on the " +
    "real corpus — spans, excision, keep-first lines, accounting") {
    val docs = T(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    // span stage: positioned K-shingles, df >= 2 distinct docs
    val sh = docs.flatMap { case (id, _, text) =>
      val w = text.split(" ", -1)
      if (w.length < K) Seq.empty
      else (0 to w.length - K).map(i =>
        (id, i + 1, md5hex(w.slice(i, i + K).mkString(" "))))
    }
    val dupH = sh.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
      .keySet
    val hitPos = sh.filter(t => dupH(t._3)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    // excision: merge hits into spans (adjacent within K), cut extents
    val excised = docs.map { case (id, lang, text) =>
      val w = text.split(" ", -1)
      val cut = Array.fill(w.length)(false)
      // every hit position covers [p, p+K-1]; the union of covers IS
      // the union of the merged extents, so marking per hit suffices
      hitPos.getOrElse(id, Array.empty[Int]).foreach { p =>
        (p to p + K - 1).foreach(i => cut(i - 1) = true)
      }
      val kept = w.zipWithIndex.collect { case (t, i) if !cut(i) => t }
      (id, lang, w.length.toLong, kept)
    }
    // line stage over the excised survivors: keep-first by (doc, sid)
    val segs = excised.filter(_._4.nonEmpty).flatMap { case (id, _, _, kw) =>
      kw.grouped(L).zipWithIndex.map { case (seg, i) =>
        (id, i + 1L, md5hex(seg.mkString(" ")), seg.length.toLong)
      }
    }
    val ownKey = segs.groupBy(_._3).filter(_._2.size >= 2)
      .view.mapValues(_.map(t => t._1 * 1048576L + t._2).min).toMap
    val lineTok = segs.groupBy(_._1).view.mapValues(_.collect {
      case (id, sid, k, n)
        if !ownKey.contains(k) || ownKey(k) == id * 1048576L + sid => n
    }.sum).toMap
    val want = excised.groupBy(_._2).map { case (lang, ds) =>
      val raw = ds.map(_._3).sum
      val span = ds.map(_._4.length.toLong).sum
      val line = ds.map(d => lineTok.getOrElse(d._1, 0L)).sum
      (lang, ds.length.toLong, raw, span, line,
        span * 10000L / raw, line * 10000L / raw)
    }.toSet
    val got = Corpus.q310DedupPipeline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want, "composed pipeline diverged from brute force")
    // the composition genuinely removes mass at BOTH stages somewhere
    assert(got.exists(t => t._4 < t._3), "span excision removed nothing")
    assert(got.exists(t => t._5 < t._4), "line dedup removed nothing")
  }

  test("both composed shuffles materialize ONCE — ReusedExchange feeds " +
    "the second consumer of the shingle AND line-key repartitions") {
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def reusedCount(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // AQE finalizes the plan
      var n = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case _: ReusedExchangeExec => n += 1
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case _ => ()
        }
        p.children.foreach(walk)
        p.subqueries.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      n
    }
    val tok = T(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
    // pre-checkpoint subplan: the shingle repartition reused
    assert(reusedCount(Corpus.q310Excised(tok)) >= 1,
      "shingle exchange NOT reused — the span stage pays it twice")
    // post-checkpoint plan: the line-key repartition reused
    assert(reusedCount(Corpus.q310DedupPipeline(spark, dir)) >= 1,
      "line-key exchange NOT reused — the line stage pays it twice")
  }
}
