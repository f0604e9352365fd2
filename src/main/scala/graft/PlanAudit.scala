package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Dev-run plan audit: dumps `explain("formatted")` for a curated set of
  * queries into `PLANS.md`, each with the property the plan must show.
  * Regenerate after plan-affecting changes:
  * `sbt "runMain graft.PlanAudit /root/testdata/sf0.01"`.
  *
  * PlanShapeSpec ENFORCES these properties (pushdowns, broadcasts, no
  * cartesian/BNLJ, no single-task windows); this artifact makes them
  * READABLE — the reviewer sees the actual physical plans the engine
  * ships, not just the assertions about them. */
object PlanAudit {

  private val picks: Seq[(String, String)] = Seq(
    "q205_html_extract" ->
      ("**Look for:** ONE FileScan feeding a single Project containing " +
        "the whole render → drop-containers → strip-tags → decode → " +
        "collapse chain as nested codegen'd RegExpReplace/StringReplace " +
        "calls, inside one WholeStageCodegen span; no exchange anywhere " +
        "(the final sort is presentation-only) — extracting a 100 TB " +
        "crawl is exactly one pass."),
    "q207_integrity_audit" ->
      ("**Look for:** the lineitem FK/rule sweep as ONE scan feeding a " +
        "chain of left joins (distinct-projected parent key sets — " +
        "part/supplier broadcast, orders-sized parents shuffle) into a " +
        "single aggregate of violation flags; separate small subtrees " +
        "for uniqueness (partial+final groupBy) and the integer-cents " +
        "reconciliation; the union is 11 constant rows."),
    "q208_winsorize" ->
      ("**Look for:** NO per-source Window — the rank subtree is " +
        "ScalableRank's localCheckpointed ExistingRDD; thresholds come " +
        "back as a BroadcastHashJoin onto the documents scan, the clip " +
        "is a map-side greatest/least projection, and the final " +
        "aggregate is partial+final on source."),
    "q209_rank_fusion" ->
      ("**Look for:** NO parquet scan and NO window — the two " +
        "retriever lists enter as 50-row LocalRelations (ranks were " +
        "attached at the bounded TakeOrdered collect), the fusion is a " +
        "tiny full outer SortMergeJoin, and the top-20 is " +
        "TakeOrderedAndProject over integer RRF sums."),
    "q210_compact_scan" ->
      ("**Look for:** an ordinary partial+final aggregate whose scan " +
        "reads the COMPACTED directory (a handful of files, not the " +
        "48-fragment fixture) — the compaction itself already ran as a " +
        "shuffle-free coalesce write; the query plan's value is that " +
        "it is indistinguishable from scanning a well-laid-out table."),
    "q212_nearest_event" ->
      ("**Look for:** ONE Union of the two scans feeding exactly TWO " +
        "Window nodes (forward and reversed sort, both partitioned by " +
        "u — never a join between orders and events), then the tag " +
        "filter and the per-order pick projection; the union shuffles " +
        "once on u and both windows reuse that partitioning (the " +
        "second pays only a re-sort)."),
    "q213_ann_recall" ->
      ("**Look for:** TWO candidate subtrees over the same persisted " +
        "cells table — the exact side's bounded 8-row batch broadcast " +
        "against the full table, and the probe side's cell-equijoin " +
        "after the 16-row centroid fan-out — meeting in a LeftSemi " +
        "hash join on (q_id, c_id) and an 8-row aggregate; the " +
        "embeddings parquet itself is never rescanned."),
    "q214_ngram_surprisal" ->
      ("**Look for:** NO documents parquet scan — the tokenize + bigram " +
        "explode materialized ONCE as the checkpointed Scan ExistingRDD " +
        "that all three consumers (bigram model, context counts, per-doc " +
        "usage) read; usage pre-aggregated to (doc, w1, w2, k) BEFORE " +
        "the model join so the join is N:1 with no fan-out; the " +
        "surprisal is a codegen'd bin()-length projection, and NO " +
        "window or driver collect appears anywhere."),
    "q215_assoc_rules" ->
      ("**Look for:** NO lineitem parquet scan — the deduped items are " +
        "one checkpointed Scan ExistingRDD feeding both self-join sides " +
        "(p1<p2 inside the join condition) and the support count (itself " +
        "checkpointed: the enrichment reads it twice), which comes back " +
        "as TWO BroadcastHashJoins; the directed expansion is a 2-row " +
        "`Generate` per surviving pair, the lift arithmetic is " +
        "decimal(38,0) end-to-end, and `TakeOrderedAndProject` tops the " +
        "rules."),
    "q216_cascade_delete" ->
      ("**Look for:** FIVE parquet scans — one audit scan per table " +
        "(customer, orders, lineitem, events; q207's discipline) plus " +
        "the one extra orders scan for the deleted-key semi-join; the " +
        "cohort build ran eagerly into the delKeys checkpoint (one " +
        "customer scan OUTSIDE this plan), so its three probe joins all " +
        "read the same ExistingRDD — never one customer re-scan per " +
        "branch; NO forced broadcast: the cohort is corpus-" +
        "proportional, so AQE picks broadcast here and shuffle joins " +
        "at 10⁹-customer scale."),
    "q217_group_split" ->
      ("**Look for:** the q100 connected-components prefix (per-round " +
        "join + min-aggregate over the checkpointed edge list) " +
        "terminating in a docs-sized LEFT join on doc_id, the split as " +
        "one codegen'd md5/conv projection on the GROUP representative, " +
        "and NO window — singletons coalesce to their own id without a " +
        "second scan."),
    "q218_triangles" ->
      ("**Look for:** NO parquet scan and NO cartesian — the whole " +
        "edge→orient→wedge→closure pipeline ran eagerly into the `tri` " +
        "checkpoint (equi-joins only, enforced upstream; the final plan " +
        "deliberately shows just its consumers), so what remains is the " +
        "two `tri` ExistingRDD reads: a 3-row corner Generate into a " +
        "partial+final aggregate, and the 1-row global total as the " +
        "bounded broadcast crossJoin."),
    "q219_ks_drift" ->
      ("**Look for:** NO documents parquet scan — the corpus collapsed " +
        "into the distinct-value histogram inside the eager prefix " +
        "passes (the second pass consumes the first's checkpoint, so " +
        "ONE ExistingRDD remains), totals aggregated from that same " +
        "checkpoint (never a corpus re-scan) as the 1-row broadcast, " +
        "and TakeOrderedAndProject limit 1 over the decimal(38,0) " +
        "cross-multiplied numerator; no single-task global window " +
        "anywhere."),
    "q220_manifest_prune" ->
      ("**Look for:** the ranged-orders FileScan whose file list is the " +
        "PRUNED subset (ManifestSpec pins it == prunedFiles exactly; " +
        "the manifest consultation itself ran at plan build, driver-" +
        "side over the file-count-sized metadata table), the row " +
        "predicate still applied above the scan (stats prune files, " +
        "never replace the filter), and one partial+final aggregate."),
    "q221_time_travel" ->
      ("**Look for:** ONE orders scan feeding the op-array Generate and " +
        "then the visible-version `Generate explode(sequence(seq, 2))` " +
        "(bounded ≤3 fan-out) into a single partial+final max_by " +
        "aggregate on (as_of, k) — never one scan or one aggregate per " +
        "version; the tombstone filter is a post-aggregate projection."),
    "q222_rolling_distinct" ->
      ("**Look for:** NO events parquet scan — the distinct (day, user) " +
        "collapse ran eagerly into the checkpoint both consumers read " +
        "(the explode and the event-days restriction), then a bounded " +
        "7-row `Generate explode(sequence(day, day+6))`, a second " +
        "distinct on (window, user), and partial+final counts — NO " +
        "range join against an event-sized side and no window function " +
        "anywhere."),
    "q223_weighted_quantile" ->
      ("**Look for:** NO per-source Window — the per-(source, value) " +
        "weight collapse is a plain partial+final aggregate, the " +
        "cumulative weights come from ScalableRank's checkpointed " +
        "prefix scan (ExistingRDD), the per-source (base, W) table " +
        "joins back as a small broadcast, and BOTH quantiles fall out " +
        "of one min(when(...)) aggregate — one pass, source-count-" +
        "sized output."),
    "q224_corpus_gate" ->
      ("**Look for:** ONE documents scan under an `Expand` (the two " +
        "count-distinct rewrite, q166's class) into a single aggregate " +
        "whose row EXPLODES into the five corpus-check rows (never a " +
        "union of aggregate-subtree copies), unioned with q219's drift " +
        "row (its subtree is the checkpointed histogram ExistingRDD — " +
        "no second documents scan); 6 constant rows out."),
    "q225_equidepth_hist" ->
      ("**Look for:** NO single-task global Window (the q45 ntile " +
        "lesson) — bucketing arrives as ScalableRank's checkpointed " +
        "ExistingRDD (range-repartitioned two-pass rank), followed by " +
        "one partial+final aggregate on the bucket id and the 32-row " +
        "presentation sort; the only corpus-sized work is the rank's " +
        "own exchange."),
    "q226_hierarchy_expand" ->
      ("**Look for:** per-level lineage truncation — the deepest " +
        "frontier enters the final union as an ExistingRDD " +
        "(localCheckpoint ran each level's frontier ⋈ edges equi-join " +
        "eagerly into the checkpoint), so the shipped plan is a flat " +
        "Union of level-sized ExistingRDDs + one md5 projection and " +
        "NEVER a join tower growing with depth; no cartesian, no " +
        "window — the cycle guard is a per-row string predicate " +
        "inside the per-level join's filter, already spent by the " +
        "time this plan is captured."),
    "q227_drift_monitor" ->
      ("**Look for:** the graded read is DriftMonitor.drift's own " +
        "plan over the persisted state — a committed-partials parquet " +
        "scan (vocabulary-sized, the corpus is never rescanned) into " +
        "a merge-by-word partial+final aggregate, a full-outer " +
        "SortMergeJoin against the reference snapshot scan, and two " +
        "1-row broadcasts (totals + n_batches, the q188 class); no " +
        "documents scan anywhere in this plan — ingest happened " +
        "behind the commit log."),
    "q228_incremental_card" ->
      ("**Look for:** NO documents scan — the card aggregates the " +
        "persisted per-batch partials parquet (semi-joined to the " +
        "committed batch ids) and the digest table only; the " +
        "countDistinct dedup mass is a scalar resolved before this " +
        "plan (a bounded driver read of the digest aggregate), so the " +
        "shipped shape is one partials scan into a global " +
        "partial+final aggregate. The corpus was ingested behind the " +
        "commit log; a refresh never rescans it."),
    "q229_pareto_frontier" ->
      ("**Look for:** NO dominance self-join anywhere — one documents " +
        "scan into the per-cost struct-argmax partial+final aggregate, " +
        "then the ScalableRank prefix-max machinery: the sweep's " +
        "shipped subtree is the localCheckpointed ExistingRDD (range " +
        "repartition + per-_pid exclusive cummax windows + the " +
        "broadcast per-partition offsets ran eagerly into the " +
        "checkpoint), followed by the n_lex > pmax filter and the " +
        "presentation sort. Window partitioned by _pid, never " +
        "global."),
    "q230_subtree_rollup" ->
      ("**Look for:** the ancestor closure entering as the union of " +
        "level-sized ExistingRDDs (the shared q226 expansion ran " +
        "eagerly into per-level checkpoints) feeding ONE Generate " +
        "(path explode); lineitem pre-aggregated partial+final to " +
        "part grain BEFORE the closure join (never line-grain rows " +
        "multiplied by depth); then one partial+final rollup on " +
        "ancestor — map-side combine is what keeps the root's " +
        "N-contribution group off a single task."),
    "q231_targeted_delete" ->
      ("**Look for:** an ordinary partial+final aggregate whose scan " +
        "reads the CLUSTERED post-delete directory — the surgical " +
        "rewrite already happened (footer-pruned candidate files " +
        "only, staged .bak-first swaps); like q210, the plan's value " +
        "is that a right-to-be-forgotten pass leaves a table " +
        "indistinguishable from one that never held the keys, which " +
        "the raw-complement oracle proves row-exactly."),
    "q232_attribution_audit" ->
      ("**Look for:** the stream-shared left-outer interval join " +
        "planned as an EQUI join on user_id (LeftOuter — AQE " +
        "broadcasts the click side at this SF; sort-merge at scale) " +
        "with the two-sided µs range bound as a join-condition " +
        "residual — NEVER a BroadcastNestedLoopJoin or cartesian; the " +
        "same bound is what makes the streaming twin's state " +
        "watermark-bounded. Watermark nodes are eliminated (batch), " +
        "and both inputs are one events scan filtered by event_type."),
    "q233_merge_upsert" ->
      ("**Look for:** an ordinary partial+final aggregate whose scan " +
        "reads the post-MERGE clustered directory — the routing and " +
        "rewrite already happened (driver walked only the " +
        "footer-pruned touch set; each touched file rebuilt by one " +
        "bounded job: file scan left-anti change keys, union the 'U' " +
        "images, staged .bak-first swap). Like q231, the plan's value " +
        "is that the merged table is indistinguishable from a table " +
        "that always held the post-CDC state — the raw-recompute " +
        "oracle proves it row-exactly."),
    "q234_stats_join" ->
      ("**Look for:** BroadcastHashJoin with the FILTERED orders side " +
        "as the build — chosen by the library's own histogram " +
        "estimate (the persisted q225 artifact read driver-side), not " +
        "by Spark's size fallback: StatsDecisionSpec re-plans the " +
        "same query with auto-broadcast disabled and the broadcast " +
        "survives, while a 28-bucket range flips to SortMergeJoin. " +
        "Customer never shuffles on the selective side."),
    "q235_shortest_path" ->
      ("**Look for:** the final round's shape — the distance table " +
        "entering as a localCheckpointed ExistingRDD (every earlier " +
        "round ran eagerly into its checkpoint, so the plan is ONE " +
        "round deep regardless of SpIters), one equi-join of that " +
        "node-sized table to the edge ExistingRDD on src, then a " +
        "partial+final HashAggregate MIN on the receiving node — " +
        "map-side combine is what absorbs hub skew before the " +
        "shuffle. No Generate, no window, no cartesian."),
    "q236_golden_record" ->
      ("**Look for:** ONE customer FileScan feeding a Generate (the " +
        "three-source struct-array explode) into a single " +
        "partial+final HashAggregate on the entity key carrying all " +
        "eight max_by cells — no window, no sort, no self-join, no " +
        "second scan: MDM consolidation as one shuffle of (key, " +
        "field-cells), map-side combined. The final sort is " +
        "presentation-only."),
    "q237_k_anonymity" ->
      ("**Look for:** ONE customer FileScan (ReadSchema pruned to the " +
        "three QI columns) feeding two chained partial+final " +
        "HashAggregates — QI-class counting then the per-segment " +
        "rollup — with map-side combine on both; the first exchange " +
        "is class-count-sized, the second segment-sized. No window, " +
        "no join: auditing 100 TB of customers is one pass."),
    "q238_ewma_smooth" ->
      ("**Look for:** ONE events scan into a SINGLE Window node " +
        "(partitioned by user_id — never global) evaluating all 16 " +
        "lag frames plus the warmup-gate lag in one pass; the EWMA " +
        "sum and the cross-multiplied spike inequality are plain " +
        "integer Project arithmetic inside WholeStageCodegen. One " +
        "per-user sort, zero joins."),
    "q239_label_prop" ->
      ("**Look for:** the final round's shape — labels entering as a " +
        "localCheckpointed ExistingRDD (one round deep regardless of " +
        "LpIters, the q235 discipline), ONE equi-join to the edge " +
        "ExistingRDD, then TWO chained partial+final HashAggregates " +
        "(vote count on (src, lab), packed-BIGINT MAX on src) — both " +
        "associative, so hub skew combines map-side before either " +
        "shuffle. The only BNLJ is the named 1-row community-count " +
        "broadcast (q218's totals class)."),
    "q240_score_calibrate" ->
      ("**Look for:** NO join, NO aggregate, NO window — one orders " +
        "FileScan (orderkey sample filter pushed) into a single " +
        "Project whose bucket assignment is `size(filter(<32-element " +
        "array literal>, …))` inside WholeStageCodegen; the stored " +
        "histogram was read driver-side (32 rows) and compiled INTO " +
        "the plan. Percentile calibration of 100 TB is exactly one " +
        "scan-shaped pass; the final sort is presentation-only."),
    "q241_fixed_width_roundtrip" ->
      ("**Look for:** a text FileScan of the 53-char-line extract " +
        "feeding ONE Project holding every positional " +
        "substring→trim→cast in a single codegen'd projection (no " +
        "UDF, no regex, no Generate), then an ordinary partial+final " +
        "aggregate. Fixed-width parse at 100 TB is line-splittable " +
        "scan work — the cost the format DOES impose is visible too: " +
        "no PushedFilters, ReadSchema is the whole line."),
    "q242_quantile_normalize" ->
      ("**Look for:** NO window partitioned by source anywhere — both " +
        "rank passes enter as localCheckpointed ExistingRDDs " +
        "(ScalableRank ran eagerly: range repartition + per-_pid " +
        "windows + broadcast offsets), the per-source (base, n) stats " +
        "and the 8-row reference boundary table come back as " +
        "BroadcastHashJoins, and the ntile-inverse bucket assignment " +
        "is plain integer Project arithmetic. A hot source never " +
        "lands in one task."),
    "q243_skyline_3d" ->
      ("**Look for:** NO self-join anywhere — one documents scan into " +
        "a codegen'd objective Project, a MapPartitions (the local " +
        "dominance frontier — the documented 3-D fallback where " +
        "q229's prefix-max sweep can't apply), then the guarded " +
        "single-partition merge reading the tiny localCheckpointed " +
        "frontier union (ExistingRDD), never the corpus. The O(n²) " +
        "dominance join the oracle states declaratively appears in " +
        "NO plan."),
    "q244_minhash_recall" ->
      ("**Look for:** the classification entering as a " +
        "localCheckpointed ExistingRDD (exact-pair-sized — the PPJoin " +
        "truth and the band candidates already ran eagerly into it), " +
        "feeding one Expand (the rollup) and a partial+final " +
        "HashAggregate; recall arithmetic is integer Project math. " +
        "Neither input is ever all-pairs — both subtrees are the " +
        "shipped q78/q72 machinery."),
    "q245_blocklist_filter" ->
      ("**Look for:** ONE documents FileScan feeding a single Project " +
        "whose blocked-token count is a codegen'd " +
        "size(filter(split(...), IN-list)) — no Generate, no join, no " +
        "UDF — then a partial+final HashAggregate on source. Gating a " +
        "100 TB corpus against a wordlist is exactly one pass."),
    "q246_phrase_search" ->
      ("**Look for:** NO documents scan — two FileScans of the " +
        "positional index table, each with SelectedBucketsCount " +
        "1 out of 8 (the term probes), equi-joined on (doc_id, " +
        "adjacent pos), then a partial+final per-doc aggregate. The " +
        "join is posting-list-sized; the corpus appears nowhere."),
    "q247_bitemporal_pit" ->
      ("**Look for:** ONE orders FileScan feeding two Generates (the " +
        "derived op log, then the literal 9-cell (T, V) grid — no " +
        "join, no cross product anywhere), a filter on the two " +
        "temporal axes, one partial+final max_by HashAggregate on " +
        "(t, voff, key) resolving the packed bitemporal key, and a " +
        "second 9-row report aggregate. Reconstructing any (T, V) " +
        "cell of a 100 TB log is one scan + two aggregates."),
    "q248_spatial_join" ->
      ("**Look for:** NO CartesianProduct and NO theta join — the " +
        "points enter as one localCheckpointed ExistingRDD read " +
        "twice, the probe side fans out through a bounded ×9 Generate " +
        "(the 3×3 cell neighborhood), the join is an EQUI " +
        "SortMergeJoin/BHJ on (cx, cy), and the radius predicate is " +
        "an integer Filter AFTER it. The N² scan the oracle states " +
        "appears in no plan."),
    "q249_greedy_match" ->
      ("**Look for:** the final round's shape — the pool entering as " +
        "a localCheckpointed ExistingRDD (one round deep regardless " +
        "of MatchRounds, the q235/q239 discipline), TWO chained " +
        "partial+final HashAggregates (packed customer-argmin, then " +
        "packed supplier-argmin), an equi self-join of the two choice " +
        "sets, and two left-anti joins shrinking the pool. No window, " +
        "no cross join; the blocking equi-join on nation happened " +
        "once, upstream of round 1."),
    "q250_vacuum" ->
      ("**Look for:** an ordinary partial+final aggregate whose scan " +
        "reads the POST-SWEEP directory — exactly the manifest's 16 " +
        "live files, no orphan part file in the scan's file list; the " +
        "GC itself ran as a driver directory loop, so the plan's value " +
        "is that it is indistinguishable from scanning a clean table."),
    "q251_bloom_prune" ->
      ("**Look for:** the scan's file list is the bloom CANDIDATE set " +
        "— ~9 of the 48 date-ranged files, tracking the key's TRUE " +
        "file count (a customer's orders really are scattered across " +
        "the date clustering; custkey min/max could never have pruned " +
        "any of the 48) — the point filter still applied on top (the " +
        "bloom skips files, never replaces the row filter), one " +
        "single-row partial+final aggregate; no join, no window."),
    "q252_interval_union" ->
      ("**Look for:** ONE user_id exchange+sort feeding BOTH window " +
        "specs (the running-max end and the island cumsum reuse the " +
        "same ordering), then two chained partial+final HashAggregates " +
        "(island collapse, user rollup). No self-join, no range join — " +
        "interval union is a sort problem, not a join problem."),
    "q253_generalize_ladder" ->
      ("**Look for:** one customer scan, a 25-row broadcast nation " +
        "join, a Generate (the ×5 rung explode), two chained " +
        "partial+final HashAggregates (class counts → rung rollup), " +
        "and the 1-row minimal-rung BroadcastNestedLoopJoin riding the " +
        "5-row result. No window; the first shuffle is " +
        "class-count-sized × 5."),
    "q254_impute_median" ->
      ("**Look for:** NO per-segment Window — the rank subtree is " +
        "ScalableRank's localCheckpointed ExistingRDD (q208's shape); " +
        "the 5-row median table returns as a BroadcastHashJoin onto " +
        "the customer scan, the fill is a map-side coalesce " +
        "projection, and the final aggregate is partial+final on " +
        "segment."),
    "q255_cusum_shift" ->
      ("**Look for:** the ONLY corpus-sized stage is the (type, day) " +
        "count — a scan-shaped partial+final HashAggregate; every " +
        "window (median rank, two prefix sums, two prefix mins) runs " +
        "over the CALENDAR-bounded counts table and shares one " +
        "event_type exchange; the output aggregate is type-count-" +
        "sized."),
    "q256_kcore" ->
      ("**Look for:** a 5-row LocalTableScan — deliberately: the " +
        "peeling ran as per-round degree HashAggregates and two " +
        "semi-joins against localCheckpointed edge RDDs (the q235/" +
        "q239 round discipline), and only iteration-cap-bounded trace " +
        "scalars ever reached the driver. The plan to audit is each " +
        "ROUND's, which the spec pins by construction (no cross join, " +
        "node-sized keep sets)."),
    "q306_chi2_drift" ->
      ("**Look for:** q219's shape — one partial+final (bin, cohort) " +
        "count aggregate over the corpus scan, the 1-row totals " +
        "broadcast riding the bin frame, and ONE scalar aggregate; " +
        "every product decimal(38,0); the critical-value lookup is a " +
        "constant array element_at, no join."),
    "q307_t_closeness" ->
      ("**Look for:** ONE customer-sized cell aggregate " +
        "(localCheckpointed — classes, bounds, and the grid all branch " +
        "off it), the dense grid as a bounded sequence explode (bands " +
        "are policy-sized), per-class cumulative windows over ≤ " +
        "band-count rows, and the global cumulative as a band-keyed " +
        "AGGREGATE of class cumulatives — NO global window anywhere; " +
        "the derived median threshold rides ScalableRank + a 1-row " +
        "broadcast."),
    "q303_atp" ->
      ("**Look for:** ONE exchange on l_partkey feeding all three " +
        "window computations (row number, running balance, and the " +
        "[current, unbounded following] future-min) over the same " +
        "sort — no second exchange, no reverse re-sort; per-part " +
        "groups are ledger-bounded (q265's byPart class), never a " +
        "corpus-wide partition."),
    "q304_dedup_accounting" ->
      ("**Look for:** exactly ONE lineDedupCore subtree (the graded " +
        "q295 plan reused verbatim) feeding a doc-keyed lang join and " +
        "a language-sized partial+final aggregate — the accounting " +
        "never recomputes or re-derives the rewrite."),
    "q305_span_excision" ->
      ("**Look for:** the q294 span subtree (shingle df + island " +
        "windows) collapsing to per-doc span lists (bounded " +
        "collect_list), then a LEFT join onto the intact doc scan and " +
        "a map-side filter/exists projection — span-free docs take " +
        "the NULL branch untouched; no second corpus text shuffle."),
    "q300_cash_discount" ->
      ("**Look for:** the greedy order materialized by ScalableRank's " +
        "range exchange (an ExistingRDD — never a single-task ORDER BY " +
        "window), the 1-row budget broadcast riding every row (q127 " +
        "totals class), and a tier-sized final aggregate; the take " +
        "predicate is a pure map-side comparison."),
    "q301_gini" ->
      ("**Look for:** ONE global row number from ScalableRank over " +
        "(region, rev, key) — NOT a per-region window (a region is a " +
        "corpus-scale slice: the single-task hazard) — with per-region " +
        "offsets coming back as a BroadcastHashJoin, the weighted sum " +
        "in decimal(38,0), and a region-sized final aggregate."),
    "q302_dunning_run" ->
      ("**Look for:** one orders scan with the status filter pushed, " +
        "the 1-row derived run-date broadcast, a customer-sized " +
        "partial+final aggregate (the MAX-level escalation), then the " +
        "3-row level rollup — no window, no self-join."),
    "q297_mwu_drift" ->
      ("**Look for:** q219's shape — one partial+final count aggregate " +
        "over (value, cohort), ScalableRank's two-pass exclusive cumsum " +
        "(range exchange + per-partition sums, an ExistingRDD — never a " +
        "single-task global window), then ONE scalar HashAggregate; " +
        "every product decimal(38,0). The whole statistic is two " +
        "passes over the value-bounded count frame."),
    "q298_depreciation" ->
      ("**Look for:** one orders scan, the ×36 Generate (output-" +
        "bounded: a posting run IS life rows per asset), and a " +
        "partial+final HashAggregate keyed by posting month — the " +
        "map side collapses each task to ≤ calendar-months rows, so " +
        "the exchange is month-count-sized regardless of asset count; " +
        "no join, no window."),
    "q299_avg_costing" ->
      ("**Look for:** the pre-grouping aggregate on the q265 grain, " +
        "then ONE per-part hash aggregate building the bounded event " +
        "list, and the fold as a single Project over sort_array + " +
        "aggregate (interpreted HOF — acceptable: per-part arrays are " +
        "ledger-bounded, the q99 call) — no window, no self-join, " +
        "parallel across parts."),
    "q294_dup_spans" ->
      ("**Look for:** the shingle table exploded ONCE from the scan " +
        "(a Generate over the codegen'd transform/slice/md5 chain — " +
        "32-hex digests on every exchange, never text), the df " +
        "aggregate partial+final on the digest, the join-back an equi " +
        "hash join whose build side is the COLLAPSED duplicated-digest " +
        "set, and the island merge as doc_id-partitioned Window nodes " +
        "(lag + running sum share one exchange+sort) — no global " +
        "window, no cartesian, cost bounded by shingle count."),
    "q295_line_dedup" ->
      ("**Look for:** ownership as a partial+final MIN aggregate over " +
        "the encoded (doc·2^20+sid) key — NOT a per-hash window (a " +
        "million-fold boilerplate line must collapse map-side, never " +
        "pile into one window partition); the drop-list join-back onto " +
        "the intact doc rows broadcast while small (AQE), and the " +
        "excision + reassembly a map-side filter/concat_ws projection."),
    "q05_cast_numeric_text" ->
      ("**Look for:** ONE events scan feeding a single Project with the " +
        "get_json_object → try_cast chain inside one WholeStageCodegen " +
        "span, then only the presentation sort's range exchange — no " +
        "join, no window, no aggregate; both casts are the regex-" +
        "guarded CASE WHEN, not naked try_cast. (The r14 bench-board " +
        "question about this query's 2.4s is closed in BASELINE.md's " +
        "r15 note: it was try_cast's exception-per-failing-row path — " +
        "~12 µs/row — not the JSON parse; the guard is 8× on the " +
        "failing column with bit-identical output.)"),
    "q10_filter_range" ->
      ("**Look for:** `PushedFilters` carrying the shipdate/discount/" +
        "quantity predicates into the parquet scan and `ReadSchema` pruned " +
        "to the projected columns — the scan does the filtering, not Spark."),
    "q21_join_broadcast" ->
      ("**Look for:** two `BroadcastHashJoin`s (nation, region) and NO " +
        "shuffle exchange on the customer side — dimension joins never " +
        "repartition the fact table."),
    "q30_agg_q1" ->
      ("**Look for:** partial `HashAggregate` → single `Exchange` on the " +
        "group keys → final `HashAggregate`, all inside `WholeStageCodegen` " +
        "spans — map-side combine shrinks the shuffle to one row per " +
        "(partition × group)."),
    "q50_sort_limit" ->
      ("**Look for:** `TakeOrderedAndProject` — global top-k without a " +
        "global sort; each partition keeps k rows and the driver merges."),
    "q53_limit_offset" ->
      ("**Look for:** the offset+limit collapsed into the limit operator " +
        "(`CollectLimit`/`GlobalLimit` with offset) over per-partition " +
        "partial sorts — one page of rows materializes, never the full " +
        "sorted table."),
    "q25_join_interval" ->
      ("**Look for:** an equi-join on `user_id` with the time-range bounds " +
        "as a post-join condition (SortMergeJoin + residual) — NOT a " +
        "BroadcastNestedLoopJoin/CartesianProduct, which is what a naive " +
        "inequality join plans."),
    "q72_dedup_minhash" ->
      ("**Look for:** the candidate generation as a plain shuffle equi-join " +
        "on the (band, signature) key — 8-byte BIGINT hashes on the wire, " +
        "never document text — and hash aggregates for the shingle/minhash " +
        "stages."),
    "q78_ngram_jaccard" ->
      ("**Look for:** candidate generation as a shuffle equi-join on the " +
        "PREFIX tokens only (each doc contributes n − ⌈t·n⌉ + 1 rarest " +
        "shingles — global-document-frequency order attached by one " +
        "broadcast-able df join), never the full inverted index; hot " +
        "shingles sort out of every prefix, so no c² blowup on " +
        "boilerplate n-grams. Then one hash-aggregate intersection count " +
        "and the exact Jaccard filter — the plan is EXACT for the " +
        "threshold (oracle runs the naive SQL), the prefix filter only " +
        "prunes candidates. Top wall-time line since r2: genuine " +
        "similarity-join work, all candidate-bounded."),
    "q92_sequence_pack" ->
      ("**Look for:** the two-pass distributed prefix scan: range " +
        "repartition by the global order key, per-partition running sums, " +
        "and NO single-task `Window` (the scale failure this op exists to " +
        "avoid)."),
    "q104_incremental_dedup" ->
      ("**Look for:** the asymmetric join — the small new-batch band table " +
        "joins the full corpus band index on the equi-key; per-ingest cost " +
        "scales with the batch, not the corpus."),
    "q105_curation_pipeline" ->
      ("**Look for:** the md5 digest projected BEFORE the exchange (the " +
        "shuffle carries 32-hex digests + 3 small columns, never document " +
        "text), the dedup window's rn<=1 pushed down as WindowGroupLimit " +
        "partial group-limits on BOTH sides of its exchange, and " +
        "partial+final aggregation for the (lang, split) stats — two data " +
        "shuffles plus the presentation sort."),
    "q100_dup_clusters" ->
      ("**Look for:** per-ROUND plans only — each hash-to-min round is " +
        "one edge⋈label equi-join plus a per-node min aggregate, its " +
        "input the previous round's localCheckpointed ExistingRDD (lineage " +
        "truncated, no recomputation cascade); the driver sees a single " +
        "changed-count scalar per round, never node data. Rounds bound by " +
        "component diameter (near-dup clusters: 2–4)."),
    "q106_dup_clusters_star" ->
      ("**Look for:** q100's contract through Kiveris large-star/small-" +
        "star contraction: each round is TWO join+aggregate passes over a " +
        "directed duplicate-free edge set, ONE job per round for the " +
        "fixpoint test, per-round localCheckpoint — provably O(log n) " +
        "rounds, the adversarial-diameter (long-chain) 100× shape. " +
        "Second-highest bench line because the fixpoint runs more rounds " +
        "than hash-to-min on shallow clusters — that is the price of the " +
        "logarithmic worst-case bound, not a plan defect."),
    "q107_indexed_dedup" ->
      ("**Look for:** the probe join against the PERSISTED bucketed band " +
        "index: the index side is a bucketed parquet scan (`Bucketed: " +
        "true`) feeding the SortMergeJoin with NO shuffle exchange above " +
        "it — only the small batch side repartitions into the bucket " +
        "layout. Per-ingest cost never includes re-shuffling the corpus."),
    "q108_zorder_prune" ->
      ("**Look for:** `PushedFilters` carrying the `l_partkey` band into " +
        "the scan over the Z-ORDERED copy and `ReadSchema` pruned to the " +
        "four needed columns — min/max row-group stats prune on a SECOND " +
        "clustered dimension, which a single-key layout cannot do " +
        "(ZOrderQueriesSpec pins files-touched ≤ 8 of 16 through this " +
        "query)."),
    "q109_simhash_clusters" ->
      ("**Look for:** every stage bounded by DISTINCT-fingerprint count, " +
        "not doc count: the doc mass collapses to per-fingerprint " +
        "(n_docs, min_doc) aggregates FIRST (partial+final), the " +
        "hamming-≤3 linking is a band equi-self-join at the fingerprint " +
        "level off ONE localCheckpointed fps frame (simhash pipeline runs " +
        "once, not 3×), and the CC rounds are q100's join+aggregate " +
        "shape. A boilerplate doc duplicated millions of times is ONE " +
        "fingerprint node — no c² anywhere."),
    "q112_chunk_split" ->
      ("**Look for:** one parquet scan with `ReadSchema` pruned to " +
        "(doc_id, text), the window starts generated then exploded " +
        "(`Generate`, output-bound — Σ ceil(n/stride) rows), and NO " +
        "exchange before the presentation sort — chunking is a map-only " +
        "pass that parallelizes per input split."),
    "q113_bm25_rank" ->
      ("**Look for:** the corpus-stats side as a 1-row broadcast " +
        "(BroadcastNestedLoopJoin against a bounded single-row aggregate " +
        "— the named-exception shape, same as q73/q90), the per-term " +
        "scores as one codegen'd projection, and `TakeOrderedAndProject` " +
        "for the top-20 — no global sort, no global window."),
    "q121_shipping_priority" ->
      ("**Look for:** all three filters as `PushedFilters` in their " +
        "scans (segment on customer, date on orders and lineitem), the " +
        "filtered customer side as a `BroadcastHashJoin` chosen by AQE " +
        "(not forced), and `TakeOrderedAndProject` for the top-10 — the " +
        "classic Q3 plan with no global sort and no oversized shuffle."),
    "q122_local_supplier_volume" ->
      ("**Look for:** region→nation as tiny broadcasts, the supplier " +
        "locality condition (`s_nationkey = c_nationkey`) riding the " +
        "JOIN keys (two-column equi-join, no post-join filter and no " +
        "nested-loop residual), the date filter pushed into the orders " +
        "scan, and partial+final aggregation for the per-nation rollup."),
    "q124_small_qty_revenue" ->
      ("**Look for:** the lineitem probe side with NO exchange at all — " +
        "the per-part average collapses to |parts| rows in its " +
        "partial+final aggregate and comes BACK as a `BroadcastHashJoin` " +
        "build side, so the threshold filter runs where the data sits " +
        "(above the broadcast threshold this degrades to a sort-merge " +
        "join whose two sides share the same `l_partkey` hash " +
        "partitioning — one reusable exchange, never a per-row correlated " +
        "subquery), the part dimension broadcast, and partial+final " +
        "aggregation for the brand rollup."),
    "q126_order_count_distribution" ->
      ("**Look for:** the priority filter applied to the orders scan " +
        "BEFORE the left join (pushed as `PushedFilters` — the ON-residual " +
        "equivalent that also prunes the shuffle), the LEFT join keeping " +
        "zero-order customers, and TWO partial+final `HashAggregate` " +
        "pairs — per-customer counts, then the distribution."),
    "q127_idle_customers" ->
      ("**Look for:** the date cutoff as `PushedFilters` in the orders " +
        "scan feeding a `BroadcastHashJoin LeftAnti` (the anti side is " +
        "the filtered RECENT slice, not all orders), and the 1-row " +
        "threshold aggregate coming back as a broadcast nested-loop over " +
        "exactly one row — the named bounded exception shape " +
        "(PlanShapeSpec lists q127), never a data-sized cartesian."),
    "q129_weighted_sample" ->
      ("**Look for:** the weights as a tiny `BroadcastHashJoin`, the " +
        "ticket explode as a `Generate` bounded by max weight (≤3 rows " +
        "per doc), partial+final `HashAggregate` for the per-doc min, " +
        "and `TakeOrderedAndProject` for the bottom-200 — no global " +
        "sort, no window, and every compared value an exact integer."),
    "q130_mix_pipeline" ->
      ("**Look for:** q123's excision shape feeding the sampler — " +
        "digest/position-only exchanges below the broadcast join-back " +
        "onto intact docs — then the weighted sample collapsing through " +
        "partial+final `HashAggregate` (per-doc min ticket) into " +
        "`TakeOrderedAndProject` (bottom-400), after which every " +
        "operator touches 400 rows. One corpus-sized text movement in " +
        "the whole composed pipeline."),
    "q120_event_transitions" ->
      ("**Look for:** a `Window` partitioned on `user_id` (never a " +
        "single-task global window) under partial+final `HashAggregate` " +
        "for the matrix rollup — per-user streams bound the sort, and the " +
        "output is |event_types|² rows regardless of corpus size."),
    "q123_segment_dedup" ->
      ("**Look for:** every exchange below the final projection carrying " +
        "digests/positions only (doc_id, seg_id, 32-hex md5 — never " +
        "segment text), the dup-key side collapsed by its aggregate before " +
        "the join, the per-doc drop-list joining back as a " +
        "`BroadcastHashJoin` onto the intact doc row (the doc side never " +
        "shuffles), and the presentation sort over 4 narrow columns."),
    "q117_substring_dedup" ->
      ("**Look for:** the duplicated-window side collapsing to a " +
        "`BroadcastHashJoin BuildRight` — the groupBy(k) aggregate " +
        "shrinks hot boilerplate to one row per window and AQE " +
        "broadcasts the (rare) dup-key list, so the probe side NEVER " +
        "shuffles on the window key; the shuffles that remain carry " +
        "md5 digests, never text. Above the broadcast threshold this " +
        "degrades to a sort-merge join whose build side is already " +
        "hash-partitioned by its aggregate — either way no replanning " +
        "of the probe."),
    "q119_retention_cohort" ->
      ("**Look for:** the cohort table built by a partial+final min " +
        "aggregate on `user_id`, then joined back as a `BroadcastHashJoin` " +
        "(cohorts are users-bounded — far below raw events; above the " +
        "threshold AQE falls back to a sort-merge join whose build side " +
        "is already partitioned by its aggregate), partial+final " +
        "`HashAggregate` pairs for the distinct and the matrix rollup, " +
        "and NO window operator anywhere — retention is pure keyed " +
        "aggregation."),
    "q136_nation_volume" ->
      ("**Look for:** the 2-of-25-nation supplier filter applied as a " +
        "BroadcastHashJoin DIRECTLY on the lineitem scan, BEFORE the " +
        "lineitem⋈orders exchange (r13 reorder — the r12 plan shuffled " +
        "the full two-year fact slice and filtered after): the " +
        "fact-fact shuffle input is the ~8% of rows surviving the " +
        "supplier cut; the customer-nation broadcast rides the orders " +
        "side; the direction OR is a post-join filter; the aggregate " +
        "is partial+final on (supp_nation, cust_nation, l_year)."),
    "q143_min_cost_supplier" ->
      ("**Look for:** the derived-partsupp catalog as ONE partial+final " +
        "`HashAggregate` pair on (partkey, suppkey); the region→nation→" +
        "supplier dim chain folded into `BroadcastHashJoin`s (no fact " +
        "shuffle for dimensions); and the per-part min joined back as an " +
        "equi-join on (partkey, cost) — the decorrelated Q2 subquery, " +
        "never a per-row re-execution."),
    "q144_nation_profit" ->
      ("**Look for:** lineitem joining the pair catalog on (partkey, " +
        "suppkey) — both sides hash-partitioned on the SAME key, so the " +
        "catalog's aggregation exchange is the only extra shuffle — " +
        "supplier/nation as `BroadcastHashJoin`s, the part filter pushed " +
        "below the pair join, and one partial+final aggregate pair on " +
        "(nation, year)."),
    "q37_percentile" ->
      ("**Look for:** NO `ObjectHashAggregate`/`SortAggregate` buffering " +
        "a whole group's values (the r9 perf-weak plan this rework " +
        "removed): the exact percentile runs as the two-pass composite " +
        "rank — range repartition on (group, value), per-partition " +
        "counts, broadcast position pick — keeping ≤2 rows per quantile " +
        "per group after the row-pick filter."),
    "q155_oov_novelty" ->
      ("**Look for:** BOTH join sides branching off the checkpointed " +
        "per-(doc, bigram) digest counts (the explode+window+aggregate " +
        "pass runs ONCE — repeats collapse before any join), exchanges " +
        "carrying 32-hex md5 digests — never bigram text — and no " +
        "FORCED broadcast: AQE broadcasts the small reference side at " +
        "this SF; at corpus scale the same plan degrades to a shuffled " +
        "equi-join on the digest (the reference is a corpus fraction, " +
        "unlike q95's benchmark set)."),
    "q156_semantic_dedup" ->
      ("**Look for:** both pair sides branching off the CHECKPOINTED " +
        "cell assignment (`Scan ExistingRDD` — the corpus × 16 centroid " +
        "pass runs once; the 16-row broadcast inside it is the named " +
        "bounded BNLJ exception, q93's class), the within-cell pair " +
        "join as an equi-join ON THE CELL id (never an all-pairs " +
        "cartesian), and the keeper selection's rn=1 pushed down as " +
        "`WindowGroupLimit` partial group-limits below its exchange."),
    "q157_hard_negatives" ->
      ("**Look for:** the bounded query batch as the BROADCAST side of " +
        "the cell join (the corpus/cells side stays at scan width with " +
        "no exchange for the join), the label-mismatch predicate inside " +
        "the join condition — narrowing candidates BEFORE the rank — " +
        "and `WindowGroupLimit` partials for the per-query top-3."),
    "q159_pack_manifest" ->
      ("**Look for:** the q92/q158 two-pass prefix-scan shape (range " +
        "repartition, per-partition running sums, no single-task " +
        "window) with the slot `Window` partitioned BY BIN — thousands " +
        "of small groups, the benign window shape — and `bpe_count` as " +
        "one codegen'd projection in the scan stage."),
    "q161_jsonl_ingest" ->
      ("**Look for:** the json `FileScan` with `ReadSchema` equal to " +
        "the DECLARED schema (no inference pass anywhere in the plan) " +
        "and one partial+final `HashAggregate` pair over the routing " +
        "keys — byte-range parallel text scan, single small shuffle."),
    "q163_heavy_hitters" ->
      ("**Look for:** the two-pass sketch-then-verify shape: the " +
        "Misra-Gries `ObjectHashAggregate` (partial per partition, one " +
        "merged row) feeding a `Generate` of ≤ k candidates that comes " +
        "back as the BROADCAST side of the recount join — the corpus " +
        "re-scan never shuffles its vocabulary, only candidate matches " +
        "reach the final aggregate."),
    "q164_session_examples" ->
      ("**Look for:** the session window partitioned BY USER (never " +
        "global), the sequence assembly as ONE ObjectHashAggregate pair " +
        "on (user, session) whose collect buffer is a single session, " +
        "and the prefix fingerprint computed as an md5 projection ABOVE " +
        "the aggregate — exchanges carry types and digests, bounded per " +
        "session."),
    "q166_data_card" ->
      ("**Look for:** ONE scan of documents under an `Expand` (the two " +
        "distinct-aggregate rewrite) into a partial+final aggregate " +
        "pair ending in a single row — the whole datasheet costs one " +
        "corpus pass, with `bpe_count`/`md5` as codegen'd projections " +
        "in the scan stage."),
    "q169_event_hopping" ->
      ("**Look for:** a 4-row `Generate explode(sequence(0, 3))` " +
        "projection (the hopping expansion — the same lowering Spark's " +
        "own TimeWindow performs) feeding a partial+final " +
        "`HashAggregate` pair; NO window function, one exchange of " +
        "(window, type) cells."),
    "q172_importance_select" ->
      ("**Look for:** the per-(doc, bucket) partial+final aggregate " +
        "BEFORE any join (repeats collapse map-side; exchanges carry " +
        "an int bucket id, never bigram text), the 256-row broadcast " +
        "odds table on the scoring join, and `TakeOrderedAndProject` " +
        "for the top-100 — no global sort."),
    "q175_column_stats" ->
      ("**Look for:** SIX independent single-column scans (each " +
        "`ReadSchema` exactly one field — columnar, so total bytes " +
        "equal one wide scan), each under its own partial+final " +
        "distinct aggregate, unioned — and NO `Expand`: the wide " +
        "multi-distinct rewrite multiplies every row ×6 through one " +
        "hash aggregate and measured 8× slower at sf0.1."),
    "q176_band_tuning" ->
      ("**Look for:** the band self-join generating candidates (equi " +
        "on (band, k1, k2) — never a cartesian), md5 digests on every " +
        "exchange, and the final 11-cell decile aggregate — cost is " +
        "candidate-bounded, corpus² never appears."),
    "q173_orc_roundtrip" ->
      ("**Look for:** the ORC scan carrying the returnflag/quantity " +
        "predicates in `PushedFilters` and a `ReadSchema` of exactly " +
        "the four referenced columns — pushdown and pruning survive " +
        "the format change from parquet."),
    "q194_pq_adc" ->
      ("**Look for:** ONE scan of embeddings computing the 8-code " +
        "array through the codegen'd pq_codes projection (codebook " +
        "inlined — no join on the corpus side), the 8-row query batch " +
        "as a BroadcastNestedLoopJoin build side (the named bounded " +
        "exception, q148's class), and the integer ADC aggregate + " +
        "per-query rank — the candidate floats are never re-read " +
        "after encoding, which is the whole PQ story."),
    "q203_mv_refresh" ->
      ("**Look for:** exactly TWO leaf scans — the months-sized stored " +
        "MV parquet and ONE orders scan filtered to the delta batch — " +
        "feeding a union + final hash aggregate; the ~80% base facts " +
        "appear nowhere in the refresh plan, which is the entire " +
        "incremental-maintenance claim."),
    "q204_attribution" ->
      ("**Look for:** ONE exchange on user_id feeding the single " +
        "ignore-nulls carry window (frame [unbounded, -1]), the " +
        "purchase filter ABOVE the window (the carry must see " +
        "non-purchase rows, so it cannot push below), and a few-row " +
        "final hash aggregate — the shuffle carries 4 narrow columns, " +
        "never props/payloads."),
    "q201_dpp_join" ->
      ("**Look for:** `dynamicpruningexpression` inside the fact " +
        "scan's PartitionFilters — the broadcast dimension's month set " +
        "binding to the partition column at run time (planning-time " +
        "elimination is impossible here; the months are the OUTPUT of " +
        "the dim filter). DppSpec additionally pins the runtime " +
        "numPartitions to exactly the dimension's month count."),
    "q202_volume_anomaly" ->
      ("**Look for:** ONE corpus-sized stage — a single events scan " +
        "feeding the (type, day) partial+final count aggregate, " +
        "appearing exactly once in the plan (the medians broadcast " +
        "within their windows via max(when(rn = ⌈n/2⌉, v)), so there " +
        "is no filter+join-back and no second scan subtree) — with " +
        "every window above it partitioned by event_type over the " +
        "CALENDAR-bounded counts table; all comparisons integer (no " +
        "doubles anywhere after the scan)."),
    "q198_bloom_prune" ->
      ("**Look for:** the xxhash64 bloom-probe `Filter` sitting DIRECTLY " +
        "above the lineitem scan — below every join and below any " +
        "exchange the join strategy would need — with the 2048-word " +
        "bit array riding the plan as one array<bigint> literal. The " +
        "probe is codegen'd element_at+shift+mask; at the SMJ scale " +
        "regime it is what shrinks the fact-side shuffle."),
    "q199_concurrency_peak" ->
      ("**Look for:** TWO window levels, neither day-wide: the running " +
        "sum partitioned by (day, hour-bucket) and the carry combine " +
        "partitioned by day over at most 24 bucket rows — the " +
        "hierarchical sweep that keeps every sort partition-bounded; " +
        "plus the session core's single user-partitioned window pair " +
        "reusing one exchange (q81's shape)."),
    "q200_copurchase" ->
      ("**Look for:** ONE exchange hash-partitioning the deduped items " +
        "on orderkey with the self-join's second side as a " +
        "`ReusedExchange` (under AQE a reused shuffle query stage), the " +
        "pair filter p1<p2 inside the join condition, and " +
        "`TakeOrderedAndProject` for the top-25 — the quadratic step is " +
        "partition-local and basket-bounded."),
    "q197_scd2_pit" ->
      ("**Look for:** ONE exchange feeding the shared lag+lead SCD2 " +
        "window pair (q98's reused sort), then a broadcast hash join " +
        "of facts to the change-compressed dimension on custkey with " +
        "the interval predicate as a post-join residual FILTER — " +
        "q25's range-join class, never a cartesian."),
    "q196_pagerank" ->
      ("**Look for:** three repeated join→aggregate rounds ALL reading " +
        "the edge checkpoint (lineage truncated per iteration — the " +
        "plan would otherwise triple per round), contribution " +
        "aggregates as partial+final hash aggregates on dst, and the " +
        "final `TakeOrderedAndProject` top-20 — never a global sort."),
    "q195_ivfpq" ->
      ("**Look for:** three bucketed index-table scans and NOTHING " +
        "else (centroids, inverted file, codes — the embeddings " +
        "parquet never appears), the 16-row centroid BNLJ ranking the " +
        "query batch's cells (the named bounded exception), and the " +
        "codes join as a broadcast EQUI hash join on cell with the " +
        "pq_adc integer kernel projected above it — cell pruning and " +
        "code compression compose, floats are never re-read."),
    "q192_avro_roundtrip" ->
      ("**Look for:** the `graft-avro` BatchScan with a ReadSchema of " +
        "exactly the four referenced fields (pruning rides an Avro " +
        "READER schema — unreferenced fields never decode) and the " +
        "priority filter evaluated ABOVE the scan: row-major " +
        "containers carry no statistics, so there is deliberately no " +
        "PushedFilters line — the documented cost of the format."),
    "q179_containment" ->
      ("**Look for:** the same candidate-bounded frame as q176 (band " +
        "equi-self-join, md5 digests on the wire, LEFT join so disjoint-" +
        "set candidates keep their i = 0 row), then a pure integer-bp " +
        "projection for C = i / min(na, nb) — no extra shuffle beyond " +
        "the shared candidateOverlaps shape; its bench cost is the " +
        "candidate frame, amortizable across q176/q179 in a real " +
        "pipeline."),
    "q178_best_of_cluster" ->
      ("**Look for:** the iterative connected-components prefix (its " +
        "per-round shape is q100's, lineage truncated by " +
        "localCheckpoint), the quality join, and ONE window " +
        "PARTITIONED by cluster root (banding bounds cluster size — " +
        "never an unpartitioned window) picking the argmax keeper."),
    "q181_selection_pipeline" ->
      ("**Look for:** the composed shape inheriting each stage's " +
        "audit — the 256-row broadcast odds table and " +
        "`TakeOrderedAndProject` from q172, the root-partitioned " +
        "keeper window from q178, and the two-pass ScalableRank (no " +
        "single-task window even at 100 survivors) from q171; ONE " +
        "materialization of the quality projection feeds both " +
        "consumers."),
    "q182_image_neardup" ->
      ("**Look for:** the narrow mapPartitions dHash stage (no " +
        "exchange before hashing), the 8-way band explode feeding an " +
        "equi self-join on (band, k) — candidates by pigeonhole, " +
        "never an image cross product — and `bit_count(xor)` " +
        "evaluated on candidates only."),
    "q183_cdc_compact" ->
      ("**Look for:** ONE partial+final `HashAggregate` pair on the " +
        "key carrying the `max_by` latest-op state — NO per-key " +
        "window, no sort below the aggregate; the tombstone filter " +
        "is a post-aggregate projection."),
    "q185_indexed_postings" ->
      ("**Look for:** a single `FileSourceScan` of the " +
        "`graft_postings_*` bucketed table with `SelectedBucketsCount` " +
        "strictly below the total (the IN-list prunes to the probed " +
        "terms' buckets) and the per-term `Window` running with NO " +
        "exchange beneath it — bucketing already co-locates each " +
        "term; the sole Exchange is the presentation sort."),
    "q186_temperature_mix" ->
      ("**Look for:** NO `Window` partitioned by source anywhere (the " +
        "textbook skewed key) — the per-source rank arrives as the " +
        "composite ScalableRank's checkpointed scan joined to TWO " +
        "small broadcasts (per-source base, driver-computed Hamilton " +
        "alloc table); the apportionment itself never appears in the " +
        "plan because it is |sources|-bounded driver work."),
    "q187_contam_attribution" ->
      ("**Look for:** the eval shingle side as a `BroadcastHashJoin` " +
        "build (benchmark-sized, q95's argument) and the per-doc " +
        "argmax as a partial+final `SortAggregate` pair over the " +
        "struct-max (Spark cannot hash-aggregate a struct max — the " +
        "sort is the agg's grouping sort, bounded per doc) — NO " +
        "Window computes the ARGMAX; the only doc_id-partitioned " +
        "Windows are shingleRows' bounded lead() pair, shared with " +
        "every shingle consumer."),
    "q188_token_drift" ->
      ("**Look for:** ONE token explode feeding ONE vocabulary " +
        "HashAggregate computing BOTH snapshots' counts (conditional " +
        "sum — not two scans), the 1-row totals as a bounded broadcast " +
        "crossJoin, and `TakeOrderedAndProject` for the movers — no " +
        "global sort, no window; all drift arithmetic in decimal(38,0)."),
    "q190_skew_salted_join" ->
      ("**Look for:** the big side carrying a `pmod(xxhash64(...))` " +
        "salt PROJECTION (no exchange added by salting itself), the " +
        "dimension's 8-way `explode(sequence(...))` replication, and " +
        "the join keyed on (suppkey, _salt) — at this SF the replicated " +
        "dimension broadcasts; at scale the same plan shuffle-joins " +
        "with the hot key spread over 8 tasks."),
    "q257_join_mv" ->
      ("**Look for:** the maintained view assembled from THREE " +
        "delta-bounded terms, never a history re-join — the stored-V " +
        "scan passes ONCE through two broadcast ANTI joins (the KEPT " +
        "term; the only V-sized stage), the ΔA ⋈ B′ term broadcasts " +
        "the delta over the overlaid dimension, and the A′ ⋈ ΔB term " +
        "is a semi-pruned orders scan bounded by affected customers; " +
        "a union of the three feeds one segment-sized aggregate."),
    "q258_surrogate_keys" ->
      ("**Look for:** a plain parquet scan of the persisted vault plus " +
        "a presentation sort — deliberately: assignment work happened " +
        "at merge time (broadcast anti join + ScalableRank's two-pass " +
        "rank + 1-row max offset), so the nightly READ of a 100 TB " +
        "vault is scan-shaped; the merge plan is pinned by " +
        "SurrogateKeySpec."),
    "q259_currency_convert" ->
      ("**Look for:** the as-of resolved ON THE DIMENSION — the " +
        "calendar-bounded (currency, month) grid generated by an " +
        "explode(sequence(...)), the carry-forward window partitioned " +
        "by currency over that tiny grid, and the FACT side joining " +
        "the resolved rates by BroadcastHashJoin on (rk, mi). No " +
        "fact-side range join, no fact fan-out anywhere."),
    "q260_fiscal_calendar" ->
      ("**Look for:** one orders FileScan feeding a single codegen'd " +
        "integer projection (datediff → div/mod 4-4-5 bucketing) into " +
        "one partial+final HashAggregate — no join, no window; the " +
        "fiscal calendar costs a 100 TB scan exactly one pass."),
    "q261_gap_ranges" ->
      ("**Look for:** NO global window — the lag subtree is " +
        "ScalableRank.withGlobalLag's localCheckpointed ExistingRDD " +
        "under one narrow MapPartitions running scan (r18: boundary " +
        "carry rides the closure's driver-combined offsets; no _pid " +
        "exchange, no window, no second materialization), followed by " +
        "a pure gap filter+projection and a presentation sort."),
    "q262_ar_aging" ->
      ("**Look for:** `PushedFilters` carrying the o_orderstatus = 'O' " +
        "predicate into the orders scan, the derived-cutoff age " +
        "bucketing as one codegen'd projection, a single equi-join to " +
        "customer, and one segment×bucket-sized partial+final " +
        "HashAggregate."),
    "q263_fiscal_yoy" ->
      ("**Look for:** the self-join on the PERIOD-COUNT-sized " +
        "aggregate frame — both join inputs are (fy, fp) HashAggregate " +
        "subtrees (the ~80-row fiscal rollup), joined broadcast; the " +
        "fact table is never self-joined, and the bp variance is a " +
        "map-side integer projection."),
    "q264_penny_allocation" ->
      ("**Look for:** every Window partitioned by l_orderkey (the " +
        "7-line bounded order groups) — grain aggregate, total-weight " +
        "sum, base-share sum, and the remainder rank all reuse the " +
        "orderkey exchange; no global window, no driver loop; output " +
        "stays line-grain."),
    "q265_fifo_costing" ->
      ("**Look for:** ONE l_partkey exchange for the WHOLE query " +
        "(r18 — the grain aggregate previously hashed the full " +
        "4-column grain first, a second corpus shuffle): the explicit " +
        "l_partkey repartition satisfies the grain aggregate's " +
        "clustering (subset key), BOTH windows', and the final " +
        "rollup's; the FIFO consumption itself is a pure " +
        "greatest/least clamp projection — no recursion, no loop, no " +
        "self-join — then one part-sized partial+final aggregate."),
    "q266_abc_class" ->
      ("**Look for:** NO global window — the inclusive running " +
        "revenue rides ScalableRank.withGlobalCumsumExclusive's " +
        "localCheckpointed ExistingRDD under one narrow MapPartitions " +
        "running scan (r18: range-partitioned prefix sums with the " +
        "driver-combined offsets in the closure; no _pid exchange, no " +
        "window); the classification is a map-side integer-compare " +
        "projection into a 3-row aggregate."),
    "q267_three_way_match" ->
      ("**Look for:** scan-shaped end to end — one lineitem FileScan, " +
        "the (order, line) grain partial+final HashAggregate, the " +
        "md5-ticket GR/IV derivations and tolerance predicates as ONE " +
        "codegen'd projection, and a 4-row status aggregate. No join " +
        "at all."),
    "q268_rfm_segments" ->
      ("**Look for:** the order fact reduced to CUSTOMER grain by one " +
        "partial+final aggregate FIRST, then three ScalableRank ntile " +
        "stages each appearing as a localCheckpointed ExistingRDD (no " +
        "unpartitioned window anywhere), a map-side CASE-ladder " +
        "projection, and a 6-row segment aggregate."),
    "q269_fulfillment_cycle" ->
      ("**Look for:** one lineitem partial+final aggregate to order " +
        "grain (min/max ship date), a single equi-join to orders, and " +
        "one priority-sized aggregate computing the late share as an " +
        "integer division INSIDE the final aggregate — no window, no " +
        "per-row late flags materialized."),
    "q270_l_diversity" ->
      ("**Look for:** two chained partial+final HashAggregates — " +
        "groupBy(QI) carrying count + exact count(DISTINCT segment) " +
        "whose partials are bounded by the 5-value segment domain " +
        "(never a raw-row shuffle per distinct), then the " +
        "nation-sized rollup. No window, no join."),
    "q271_lm_quality_filter" ->
      ("**Look for:** the corpus bigram explode materialized ONCE " +
        "(localCheckpointed ExistingRDD read by the model-build and " +
        "the scoring subtrees), the model assembled by " +
        "vocabulary-bounded aggregates, a LEFT equi-join of per-doc " +
        "bigram counts to the model with the OOV backoff as a " +
        "map-side coalesce, and a doc-count-sized final aggregate."),
    "q272_link_predict" ->
      ("**Look for:** the truncation rank window partitioned by " +
        "SUPPLIER (bounded groups, never global), pair generation as " +
        "an equi self-join on sk over the ≤8-row truncated neighbor " +
        "lists (the d² hub blowup is structurally capped at C(8,2) " +
        "per key), the full-degree weight joined from the degree " +
        "aggregate, and TakeOrderedAndProject for the top-20 — no " +
        "full sort."),
    "q273_uom_rollup" ->
      ("**Look for:** the conversion ladder derived in the PART " +
        "DIMENSION subtree and arriving as a BroadcastHashJoin onto " +
        "the lineitem scan; the unit dispatch and base-quantity " +
        "multiply as one codegen'd projection; one brand-sized " +
        "partial+final aggregate. The fact side carries no " +
        "per-row conversion state."),
    "q274_seasonal_index" ->
      ("**Look for:** one orders⋈customer equi-join feeding the " +
        "(segment, month) partial+final HashAggregate, then the 5-row " +
        "per-segment totals returning as a BroadcastHashJoin (keyed on " +
        "segment — not a cross join) with the index as a map-side " +
        "integer projection. No window anywhere."),
    "q275_mv_retract" ->
      ("**Look for:** the stored-MV parquet scan unioned with the " +
        "SIGNED delta partial aggregate (two delta-term order scans — " +
        "inserts and tombstone images, both CDC-sized in production), " +
        "one final month-sized re-aggregate, and the count>0 filter " +
        "dropping vanished groups. History is never re-aggregated; " +
        "the only fact-sized stages are the delta terms."),
    "q276_promo_uplift" ->
      ("**Look for:** ONE pass over the fact — lineitem⋈orders " +
        "equi-join, the part treatment flag arriving as a " +
        "BroadcastHashJoin, a single 4-group partial+final " +
        "HashAggregate, and the 4-row frame pivoting to the one-row " +
        "report via a second tiny aggregate. No window, no self-join, " +
        "no repeated fact scan per cell."),
    "q277_posting_period" ->
      ("**Look for:** one orders FileScan feeding a single codegen'd " +
        "projection (ticket lateness, last_day + grace deadline, the " +
        "posting-month CASE) into one month-sized partial+final " +
        "HashAggregate — no join, no window; the close reconciliation " +
        "costs a 100 TB ledger one pass."),
    "q278_benford_audit" ->
      ("**Look for:** one orders scan, the first-digit extraction as a " +
        "substring of the BIGINT's decimal rendering (no float log " +
        "anywhere), a 9-row partial+final HashAggregate, and the 1-row " +
        "total returning as a literal (driver scalar) in the share " +
        "projection. Constant-sized output at any volume."),
    "q279_supplier_hhi" ->
      ("**Look for:** the part dimension arriving as a " +
        "BroadcastHashJoin onto the lineitem scan, one " +
        "(brand, supplier) partial+final HashAggregate, the 25-row " +
        "brand totals returning as a second BroadcastHashJoin (keyed " +
        "on brand), and a brand-sized rollup with the share/HHI floors " +
        "as map-side integer projections. No window."),
    "q280_return_rate_lcb" ->
      ("**Look for:** one lineitem scan with the part dimension " +
        "broadcast, a cell-sized partial+final HashAggregate, and the " +
        "whole LCB chain — shrinkage floors, the double sqrt estimate, " +
        "the ±2 candidate correction — as ONE codegen'd projection " +
        "over the aggregate output. No join after the aggregate, no " +
        "window, no UDF."),
    "q281_repeat_curve" ->
      ("**Look for:** NO per-order window — the per-customer count " +
        "aggregate feeds a bounded Generate (explode of " +
        "sequence(1, cnt)), one n-sized partial+final HashAggregate, " +
        "and the conversion self-join runs on the max-n-sized frame " +
        "(a broadcast join of a few dozen rows)."),
    "q282_price_volume_mix" ->
      ("**Look for:** ONE pass over the fact — lineitem⋈orders with " +
        "the year filter, the part brand broadcast, a single " +
        "(brand, year) partial+final HashAggregate — and the bridge " +
        "arithmetic on the brand-sized frame joined across the two " +
        "years broadcast. The fact table is never self-joined."),
    "q283_ic_elimination" ->
      ("**Look for:** the supplier and customer nation lookups " +
        "arriving as BroadcastHashJoins onto the single " +
        "lineitem⋈orders fact join, the intra-group predicate as a " +
        "map-side integer compare, and one region-sized partial+final " +
        "aggregate. No self-join, no second fact pass."),
    "q284_embedding_drift" ->
      ("**Look for:** ONE embeddings scan feeding a ×dim Generate " +
        "(posexplode) into a (label, half, pos) partial+final " +
        "HashAggregate; every join after that runs on the " +
        "dim×labels-sized aggregate frame (broadcast), and the final " +
        "rollup is label-sized. No window, no corpus re-read."),
    "q285_errata_replay" ->
      ("**Look for:** two parse subtrees over the WA projection (the " +
        "good-arity filter and the err-arity filter — in production " +
        "two different sinks), the repair as a codegen'd " +
        "regexp_replace, the re-parse, and a broadcast LEFT ANTI join " +
        "on the key triple guarding the union. No window, no driver " +
        "loop."),
    "q286_late_census" ->
      ("**Look for:** NO global window — the running max over arrival " +
        "order is ScalableRank.withGlobalCummaxExclusive's " +
        "localCheckpointed ExistingRDD (per-partition prefix maxes + " +
        "broadcast offsets); the lateness flags are map-side integer " +
        "compares feeding one type-sized partial+final aggregate."),
    "q287_dim_usage" ->
      ("**Look for:** per dimension, the WINDOWED fact key set " +
        "collapsing FIRST (year filter + distinct partial+final " +
        "HashAggregate — a key-only shuffle), then a membership left " +
        "join against the dimension and a 1-row count; three such " +
        "subtrees unioned into a 3-row result. Join outputs are " +
        "dimension-sized, never fact-sized."),
    "q288_idoc_reconcile" ->
      ("**Look for:** ONE text FileScan feeding two type-byte filters " +
        "with the positional parses as codegen'd substring/cast " +
        "projections (no UDF, no regex), the data side reduced to " +
        "document grain by a partial+final aggregate BEFORE the " +
        "control join, and a verdict-sized rollup. The file is read " +
        "once; no per-record-type re-scan."),
    "q289_trend_fit" ->
      ("**Look for:** one orders⋈customer equi-join into the " +
        "(segment, month) partial+final HashAggregate, then the OLS " +
        "moments as a SECOND partial+final aggregate over the " +
        "months-sized frame with the decimal(38,0) products inside " +
        "the aggregate expressions; the floor division is a map-side " +
        "projection. No window, no driver-side matrix."),
    "q290_path_mining" ->
      ("**Look for:** ONE events scan, a single user_id exchange+sort " +
        "feeding one Window node carrying BOTH leads, the triple " +
        "concat as a map-side projection, a path-sized partial+final " +
        "aggregate, and TakeOrderedAndProject for the top-10 — no " +
        "full sort, no self-join."),
    "q291_discount_ladder" ->
      ("**Look for:** one lineitem scan into the 11-band partial+final " +
        "HashAggregate, and the step computed by a broadcast self-join " +
        "of that band-sized frame shifted one band — NO window node " +
        "anywhere (the tiny unpartitioned window would be the " +
        "single-task shape the suite bans)."),
    "q292_commission_tiers" ->
      ("**Look for:** one lineitem scan into the supplier-keyed " +
        "partial+final HashAggregate, then the ENTIRE bracket walk " +
        "(per-tier clamp, per-tier floor, reached-tier CASE) as one " +
        "codegen'd projection over the aggregate output. No join, no " +
        "window — a comp run over a 100 TB fact is one pass."),
    "q293_dup_payments" ->
      ("**Look for:** the payments universe (grain aggregate ∪ " +
        "ticket-filtered reposts) materialized once, the candidate " +
        "join keyed on (supplier, cents) — an EQUI join whose pair " +
        "fan-out is block-bounded, never a theta join — with the " +
        "date-window predicate as a Filter above it, and two " +
        "supplier-sized aggregates meeting in a left join."))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb ++= "# Plan audit (generated — do not hand-edit)\n\n"
    sb ++= s"`sbt \"runMain graft.PlanAudit $sfDir\"` — formatted physical\n"
    sb ++= "plans for the queries whose plan SHAPE is the point. The\n"
    sb ++= "matching enforcement lives in PlanShapeSpec; SURVEY.md §4.4 maps\n"
    sb ++= "each hazard to its mitigation.\n\n"
    picks.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      sb ++= s"## $name\n\n$note\n\n```\n$plan```\n\n"
    }
    // q310's shared-exchange proof needs the EXECUTED plans: ReuseExchange
    // under AQE resolves at stage materialization, and the shingle reuse
    // lives in the pre-checkpoint subplan the final query no longer shows.
    locally {
      import org.apache.spark.sql.functions.{col, split}
      val tok = ops.T(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      val ex = ops.Corpus.q310Excised(tok)
      // execute the SAME QueryExecution at O(1) driver memory: a
      // collect would materialize every document's kept-token array on
      // the driver, and Dataset.foreach would run the SEPARATE
      // rddQueryExecution, leaving ex.queryExecution's AQE plan
      // unfinalized — the r16 review caught the PLANS.md section going
      // isFinalPlan=false with its ReusedExchange proof missing
      ex.queryExecution.toRdd.foreach(_ => ())
      sb ++= "## q310_dedup_pipeline — excision subplan (EXECUTED, AQE " +
        "final)\n\n**Look for:** exactly ONE `Exchange hashpartitioning" +
        "(h…)` materialized for the positioned-shingle table, with the " +
        "second consumer reading a `ReusedExchange` — the df aggregate " +
        "and the position join-back share the shuffle, so raw shingle " +
        "rows cross the wire once (DedupPipelineSpec enforces this).\n\n" +
        s"```\n${ex.queryExecution.executedPlan}```\n\n"
      val full = SparkEntry.queries("q310_dedup_pipeline")(spark, sfDir)
      full.collect()
      sb ++= "## q310_dedup_pipeline — line stage (EXECUTED, AQE final)\n\n" +
        "**Look for:** the line-key `Exchange hashpartitioning(k…)` " +
        "materialized once with a `ReusedExchange` feeding the ownership " +
        "join-back; the excised frame enters as a localCheckpointed " +
        "`Scan ExistingRDD` (the q215 multi-consumer discipline) so the " +
        "span stage never re-executes.\n\n" +
        s"```\n${full.queryExecution.executedPlan}```\n\n"
    }
    // q317: the corpus-build flagship — the q310 shared-exchange
    // discipline at PIPELINE scope, plus the post-checkpoint
    // decon/mix/pack tail as one plan.
    locally {
      val st = ops.Corpus.corpusBuildStages(spark, sfDir)
      val ex = ops.Corpus.q310Excised(st.gated)
      ex.queryExecution.toRdd.foreach(_ => ())
      sb ++= "## q317_corpus_build — excision subplan over the GATED " +
        "corpus (EXECUTED, AQE final)\n\n**Look for:** the same single " +
        "`Exchange hashpartitioning(h…)` + `ReusedExchange` pair as " +
        "q310's excision — the flagship inherits the shared shingle " +
        "shuffle verbatim because it calls the identical q310Excised " +
        "stage on its gated corpus (CorpusBuildSpec enforces this); " +
        "upstream, the gated frame enters as the localCheckpointed " +
        "clean+score projection (`Scan ExistingRDD`), so the JSONL " +
        "ingest and the PII rewrite run exactly once for the whole " +
        "pipeline.\n\n" +
        s"```\n${ex.queryExecution.executedPlan}```\n\n"
      val manifest = st.manifest
      manifest.collect()
      sb ++= "## q317_corpus_build — decon/mix/pack tail (EXECUTED, AQE " +
        "final)\n\n**Look for:** the line-key exchange + `ReusedExchange` " +
        "pair (the q310 line stage re-seated over the gated excision); " +
        "the eval-shingle side entering the contamination join as a " +
        "`BroadcastExchange` (benchmark-sized, the q95 argument) over a " +
        "LEFT ANTI join; the mix and pack prefix sums as the TWO-pass " +
        "ScalableRank shape (range repartition + per-partition window + " +
        "broadcast offsets join) — no single-task global window " +
        "anywhere in the composed plan.\n\n" +
        s"```\n${manifest.queryExecution.executedPlan}```\n\n"
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size + 4} plans)")
    spark.stop()
  }
}
