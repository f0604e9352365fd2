package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Guards the physical plan shapes the 100 TB design depends on — a
  * query that still returns right answers through a regressed plan
  * (lost pushdown, broadcast turned shuffle, sort instead of top-k,
  * nested-loop instead of hash join) fails here, not in production.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def planOf(df: DataFrame): String = {
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("q10 filter predicates reach the parquet scan (PushedFilters)") {
    val plan = planOf(Relational.q10FilterRange(spark, SparkTestBase.Sf0001))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("IsNotNull(l_discount)") ||
      plan.contains("GreaterThanOrEqual(l_discount"), plan)
  }

  test("q01 projection prunes the scan to the selected columns") {
    val plan = planOf(Relational.q01ScanProject(spark, SparkTestBase.Sf0001))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:" +
      "bigint,l_suppkey:bigint,l_quantity:double>"), plan)
  }

  test("q21 dimension joins broadcast (no shuffle of the fact side)") {
    val plan = planOf(Relational.q21JoinBroadcast(spark, SparkTestBase.Sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q25 interval join plans as an equi-join with range residual, " +
    "not a nested-loop cross product") {
    val plan = planOf(Relational.q25JoinInterval(spark, SparkTestBase.Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("q50 top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.q50SortLimit(spark, SparkTestBase.Sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q86 ANN broadcasts the query set (big side never shuffles)") {
    val plan = planOf(TrainingData.q86AnnLsh(spark, SparkTestBase.Sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q95 broadcasts the eval shingle set (the corpus side never " +
    "shuffles for the decontamination join)") {
    val plan = planOf(Curation.q95Decontaminate(spark, SparkTestBase.Sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q102 fuzzy match joins the name dictionary, not raw part rows " +
    "(vocabulary-squared cost, row-count independent)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = Curation.q102FuzzyMatch(spark, SparkTestBase.Sf0001)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    // BOTH sides of the blocking join must be the distinct-name
    // aggregate — one raw side would restore row-count-dependent cost
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        assert(side.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"q102 join side is not dictionary-aggregated:\n$side")
      }
    }
  }

  test("q99's scale/codes intermediates are evaluated once per row, not " +
    "inlined into the HOF lambdas (the CollapseProject quadratic trap)") {
    val plan = Curation.q99EmbedQuantize(spark, SparkTestBase.Sf0001)
      .queryExecution.optimizedPlan.toString
    // one array_max for the scale column; inlining would duplicate it
    // into the codes AND sse lambdas (3+ occurrences, re-run per element)
    val occurrences = "array_max".r.findAllIn(plan).length
    assert(occurrences == 1, s"array_max appears $occurrences times:\n$plan")
  }

  test("q04 pushes its filters into the RFC scan's OPTIONS (visible in " +
    "the DSv2 scan description)") {
    val plan = planOf(graft.sources.rfc.RfcQueries.q04RfcSourceScan(
      spark, SparkTestBase.Sf0001))
    assert(plan.contains("sap-rfc"), plan)
    assert(plan.contains("REGIONKEY >= '2'") && plan.contains("NATIONKEY < '20'"),
      plan)
  }

  test("q86's probe broadcast is bounded by construction: the query " +
    "batch carries the explicit <=Q86QueryCap cap (the q148/q194/q213 " +
    "bounded-batch contract), so the exploded broadcast is <= cap x " +
    "masks rows — never corpus/50 x masks") {
    val capped = 50L * TrainingData.Q86QueryCap
    val plan = planOf(TrainingData.q86AnnLsh(spark, SparkTestBase.Sf0001))
    // the probe side broadcasts; the cap predicate reaches its scan
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains(s"LessThan(vec_id,$capped)") ||
      plan.contains(s"vec_id#") && plan.contains(s"< $capped"), plan)
    // the worst-case broadcast is a compile-time constant, ~45k rows
    assert(TrainingData.Q86QueryCap * TrainingData.lshMasks.size <= 50000)
  }

  test("no query plans a cartesian product or nested-loop join " +
    "(except deliberate bounded broadcast crossJoins: 1-row in " +
    "q73/q90/q97/q113/q115/q127/q145, the 16-row centroid table in " +
    "q93/q152/q156/q157, the 8-row query batch in q148/q194)") {
    val oneRowCross = Set("q06_sink_layout", "q73_sim_cosine_topk",
      "q90_tfidf_top_terms", "q93_ann_ivf", "q97_source_rebalance",
      "q113_bm25_rank", "q114_media_pipeline", "q115_histogram_rollup",
      "q116_audio_pipeline", "q127_idle_customers",
      "q145_important_stock", // 1-row total/count broadcast (q127 shape)
      "q148_batch_topk",      // 8-row query batch broadcast (q93 class)
      "q152_indexed_ann",     // 16-row persisted centroid table (q93 class)
      "q154_video_pipeline",  // two 1-row summary frames (q114 class)
      "q156_semantic_dedup",  // 16-row centroid assignment (q93 class)
      "q157_hard_negatives",  // 16-row centroid assignment (q93 class)
      "q188_token_drift",     // two 1-row broadcasts: totals + tvd_bp
                              // (q127 class)
      "q194_pq_adc",          // 8-row query batch broadcast (q148
                              // class): PQ's ADC is by definition a
                              // full-codes-scan per bounded query batch
      "q195_ivfpq",           // 16-row persisted centroid table in the
                              // probe's assignRanked (q152 class); the
                              // codes join itself is an equi hash join
      "q213_ann_recall",      // 8-row query batch broadcast on the
                              // exact side (q148 class): recall is BY
                              // DESIGN measured against a bounded
                              // sampled batch, never corpus queries
      "q218_triangles",       // 1-row global triangle total rides every
                              // row (q188's totals class)
      "q219_ks_drift",        // 1-row (n1, n2) totals broadcast
                              // (q127/q188 class)
      "q224_corpus_gate",     // composes q219 — inherits its 1-row
                              // totals broadcast
      "q227_drift_monitor",   // DriftMonitor.drift's two 1-row
                              // broadcasts: totals + n_batches (q188's
                              // totals class, graded through the
                              // streaming read path)
      "q239_label_prop",      // 1-row global community count rides
                              // every row (q218's totals class)
      "q253_generalize_ladder", // 1-row minimal-rung scalar rides the
                              // 5-row ladder (q127's totals class)
      "q300_cash_discount",   // 1-row derived budget rides every ranked
                              // invoice (q127's totals class)
      "q302_dunning_run",     // 1-row derived run date rides every open
                              // item (q127's totals class)
      "q306_chi2_drift",      // 1-row cohort totals ride the bin frame
                              // (q219's totals class)
      "q312_dup_mass_curve",  // 1-row corpus-token total rides the
                              // bucket curve (q127's totals class)
      "q314_quality_yield_curve", // 1-row totals ride the ≤11-row
                              // threshold curve (q127's totals class)
      "q307_t_closeness")     // two 1-row broadcasts: band bounds + the
                              // derived median threshold (q127 class)
    for ((name, fn) <- graft.SparkEntry.queries if !oneRowCross(name)) {
      val plan = fn(spark, SparkTestBase.Sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name: cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name: BNLJ")
    }
  }

  test("no query plans an unpartitioned (single-task) window") {
    // every declared op: global windows funnel all rows to one task
    for ((name, fn) <- graft.SparkEntry.queries if name != "q06_sink_layout") {
      val plan = fn(spark, SparkTestBase.Sf0001).queryExecution.optimizedPlan
      val global = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(global.isEmpty, s"$name has a global window")
    }
  }
}
