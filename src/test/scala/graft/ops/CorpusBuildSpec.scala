package graft.ops

import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q317, the end-to-end corpus-build flagship: every stage must
  * genuinely bite on the fixture (a composed hash that passes because a
  * stage was vacuous proves less than the scaladoc claims), the shared
  * exchanges must actually be shared on the EXECUTED plans (the q310
  * ReuseExchange discipline at pipeline scope), and the manifest must be
  * self-consistent bin geometry. Cross-engine equality itself is the
  * driver's DuckDB hash gate. */
class CorpusBuildSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val st = Corpus.corpusBuildStages(spark, dir)

  /** Executes `df`'s own QueryExecution (AQE resolves reuse at stage
    * materialization) and counts ReusedExchange nodes — descending into
    * QueryStageExec, which hides its subtree from `children` (the
    * DedupPipelineSpec walker). */
  private def reusedExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.queryExecution.toRdd.foreach(_ => ())
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case _: ReusedExchangeExec => n += 1
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  test("every stage bites: ingest routing, gate, span excision, line " +
    "rewrite, decontamination, mix cut, multi-bin pack") {
    val nDocs = T(spark, dir, "documents").count()
    val nGated = st.gated.count()
    val nFin = st.fin.count()
    // gate: a nonzero threshold that genuinely drops docs
    assert(st.thr >= 1 && st.thr <= 10, s"degenerate threshold ${st.thr}")
    assert(nGated < nDocs, "quality gate dropped nothing")
    // span excision: at least one doc fully excised (gated > fin) and
    // at least one doc partially rewritten (tok < cleaned raw + 4)
    assert(nFin < nGated, "no doc fully excised — span stage vacuous")
    val rewritten = st.fin.join(
        T(spark, dir, "documents").select(col("doc_id"),
          (size(expr("filter(split(text, ' '), x -> x != '')")) + 4)
            .cast("long").as("raw4")),
        "doc_id")
      .filter(col("tok") < col("raw4")).count()
    assert(rewritten > 0, "no doc rewritten — dedup stages vacuous")
    // decontamination drops at least one survivor
    val nCont = st.contaminated.count()
    assert(nCont > 0, "decontamination dropped nothing — stage vacuous")
    assert(st.survivors.count() == nFin - st.fin
      .join(st.contaminated, Seq("doc_id"), "left_semi").count())
    // mix: the budget cuts at least one doc (fr binds on this corpus)
    val nSurv = st.survivors.count()
    val nAdm = st.admitted.count()
    assert(nAdm < nSurv, s"budget admission cut nothing ($nAdm/$nSurv)")
    // pack: more than one bin
    assert(st.manifest.select("bin").distinct().count() >= 2,
      "single-bin pack — geometry untested")
  }

  test("manifest is self-consistent bin geometry: offsets in [0, 2000), " +
    "bins/slots contiguous, and (bin, tok_offset) re-derive from the " +
    "running token sum in doc order") {
    val rows = st.manifest.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5))) // bin, slot, doc_id, tokens, tok_offset
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, d, _, off) =>
      assert(off >= 0 && off < 2000, s"doc $d offset $off out of range")
    }
    // manifest order (bin, slot) IS global doc order: cumex is monotone
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq,
      "manifest order is not doc order")
    var cumex = 0L
    rows.foreach { case (bin, _, d, tok, off) =>
      assert(bin == cumex / 2000, s"doc $d bin drifted")
      assert(off == cumex - bin * 2000, s"doc $d offset drifted")
      cumex += tok
    }
    // slots contiguous from 1 within each bin
    rows.groupBy(_._1).foreach { case (bin, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"bin $bin slots not contiguous")
    }
  }

  test("the composed plan SHARES its heavy exchanges: the excision " +
    "subplan materializes the positioned-shingle exchange once and the " +
    "line stage its line-key exchange once (ReusedExchange on the " +
    "EXECUTED plans)") {
    // the pre-checkpoint excision subplan over the GATED corpus — the
    // exact subtree q317 checkpoints (same probe as DedupPipelineSpec,
    // at pipeline scope)
    val ex = Corpus.q310Excised(st.gated)
    assert(reusedExchanges(ex) >= 1,
      "shingle exchange not shared in the q317 excision subplan")
    // the line stage consumes the checkpointed excised frame; its
    // (doc, sid, md5) repartition must be materialized once and reused
    val line = Corpus.lineCleanOf(st.excised)
    assert(reusedExchanges(line) >= 1,
      "line-key exchange not shared in the q317 line stage")
  }
}
