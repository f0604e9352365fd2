package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse data-quality auditing — the dbt-test / Deequ surface: a
  * declared constraint set (foreign keys, uniqueness, accepted-range
  * rules, cross-table reconciliation, coverage) evaluated in bulk, one
  * result row per constraint. The complement to q191's per-document
  * quality audit: q191 explains why a DOCUMENT was dropped, q207
  * certifies whether a TABLE is fit to join — the gate every warehouse
  * load (and every training-data refresh joining behavioral tables)
  * runs before publishing a snapshot.
  */
object Audit {

  /** 2-dp currency/ratio columns to exact integer hundredths:
    * ⌊x·100+½⌋ — one multiply and one floor on a double, the same
    * singly-rounded chain in both engines (the FixDot discipline at
    * scale 10²). */
  private def c2(column: String) =
    expr(s"cast(floor(cast($column as double) * 100.0 + 0.5) as bigint)")

  /** q207: bulk integrity audit over the warehouse schema — 11 declared
    * constraints, one row each: `(check, kind, n_checked, n_bad, ok)`.
    *
    * The fixture exercises BOTH verdicts genuinely (the q191 bar): the
    * five FK checks and the range rule pass; lineitem's
    * (orderkey, linenumber) uniqueness, the ship-after-order rule, the
    * totalprice reconciliation, and order→lineitem coverage all fail
    * with real counts — the synthetic generator random-assigns
    * linenumbers and never reconciles order totals, exactly the defects
    * a load gate exists to catch.
    *
    * Shapes (each is the canonical audit plan for its kind):
    *  - FK + rule checks batch per CHILD table: ONE lineitem scan feeds
    *    a chain of three left joins against distinct-projected parent
    *    KEY sets (key-only shuffles; small parents broadcast, the
    *    orders-sized one SMJs at 100 TB) and a single aggregate counts
    *    every null-parent flag and rule violation in one pass; the five
    *    constraint rows are then EXPLODED from that one aggregate row
    *    (a Generate over the 1-row aggregate, not a 5-way union of the
    *    aggregate subtree — a union would re-instantiate the whole
    *    3-join sweep once per constraint, which is exactly the failure
    *    this shape exists to avoid). One audit sweep per child table,
    *    never one scan per constraint; IntegrityAuditSpec counts the
    *    physical lineitem FileScans (== 3: FK/rule sweep, uniqueness
    *    group-by, reconciliation sum).
    *  - Uniqueness: groupBy(key) → count>1, partial+final.
    *  - Reconciliation: integer-cents line charges (ep·(100−d)·(100+t)
    *    at scale 10⁶, associative BIGINT sums — no double ever crosses
    *    an aggregate) grouped per order, outer-joined to orders,
    *    mismatch = |total·10⁴ − Σ| > 10⁴ (±1 cent) or no lines at all.
    *
    * Output is constraint-count-sized (11 rows). */
  def q207IntegrityAudit(s: SparkSession, dir: String): DataFrame = {
    def agg1(df: DataFrame, check: String, kind: String, bad: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).as("n_checked"),
          coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as("n_bad"))
        .select(lit(check).as("check"), lit(kind).as("kind"),
          col("n_checked"), col("n_bad"))

    val li = T(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val ordKeys = T(s, dir, "orders")
      .select(col("o_orderkey").as("p_ok"), col("o_orderdate").as("p_odate"))
    val partKeys = T(s, dir, "part").select(col("p_partkey").as("p_pk")).distinct()
    val suppKeys = T(s, dir, "supplier").select(col("s_suppkey").as("p_sk")).distinct()

    // one lineitem sweep: three FK checks + the range rule + the
    // temporal rule, all counted in a single aggregate
    val liJoined = li
      .join(ordKeys, col("l_orderkey") === col("p_ok"), "left")
      .join(partKeys, col("l_partkey") === col("p_pk"), "left")
      .join(suppKeys, col("l_suppkey") === col("p_sk"), "left")
    val liAgg = liJoined.agg(
      count(lit(1)).as("n"),
      sum(when(col("p_ok").isNull, 1L).otherwise(0L)).as("bad_fk_ord"),
      sum(when(col("p_pk").isNull, 1L).otherwise(0L)).as("bad_fk_part"),
      sum(when(col("p_sk").isNull, 1L).otherwise(0L)).as("bad_fk_supp"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L)
        .otherwise(0L)).as("bad_disc"),
      sum(when(col("p_ok").isNotNull && col("l_shipdate") < col("p_odate"), 1L)
        .otherwise(0L)).as("bad_ship"))
    // one constraint row per struct, exploded from the SINGLE aggregate
    // row — never a union that re-instantiates the join+aggregate subtree
    def rowOf(check: String, kind: String, badCol: String) =
      struct(lit(check).as("check"), lit(kind).as("kind"),
        col("n").as("n_checked"), col(badCol).as("n_bad"))
    val liRows = liAgg.select(explode(array(
        rowOf("fk_lineitem_orderkey", "fk", "bad_fk_ord"),
        rowOf("fk_lineitem_partkey", "fk", "bad_fk_part"),
        rowOf("fk_lineitem_suppkey", "fk", "bad_fk_supp"),
        rowOf("rule_discount_range", "rule", "bad_disc"),
        rowOf("rule_ship_after_order", "rule", "bad_ship"))).as("_r"))
      .select(col("_r.check"), col("_r.kind"),
        col("_r.n_checked"), col("_r.n_bad"))

    val ordCust = agg1(
      T(s, dir, "orders").select("o_custkey")
        .join(T(s, dir, "customer").select(col("c_custkey").as("p_ck")).distinct(),
          col("o_custkey") === col("p_ck"), "left"),
      "fk_orders_custkey", "fk", col("p_ck").isNull)

    val evCust = agg1(
      T(s, dir, "events").select("user_id")
        .join(T(s, dir, "customer").select(col("c_custkey").as("p_ck")).distinct(),
          col("user_id") === col("p_ck"), "left"),
      "fk_events_userid", "fk", col("p_ck").isNull)

    def unique(df: DataFrame, check: String, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("kn"))
        .agg(coalesce(sum(col("kn")), lit(0L)).as("n_checked"),
          coalesce(sum(when(col("kn") > 1, col("kn")).otherwise(0L)), lit(0L))
            .as("n_bad"))
        .select(lit(check).as("check"), lit("unique").as("kind"),
          col("n_checked"), col("n_bad"))

    val uOrd = unique(T(s, dir, "orders").select("o_orderkey"),
      "unique_orders_orderkey", Seq("o_orderkey"))
    val uLi = unique(li.select("l_orderkey", "l_linenumber"),
      "unique_lineitem_line", Seq("l_orderkey", "l_linenumber"))

    // reconciliation: Σ over each order's lines of
    // cents(ep)·(100−cents(disc))·(100+cents(tax)) — dollars at scale
    // 10⁶ — vs cents(o_totalprice)·10⁴, within ±1 cent (10⁴)
    val charges = li
      .select(col("l_orderkey"),
        (c2("l_extendedprice") * (lit(100L) - c2("l_discount"))
          * (lit(100L) + c2("l_tax"))).as("charge_u"))
      .groupBy("l_orderkey").agg(sum("charge_u").as("sum_u"))
    val ordRecon = T(s, dir, "orders").select("o_orderkey", "o_totalprice")
      .join(charges, col("o_orderkey") === col("l_orderkey"), "left")
    // reconciliation and coverage share ONE pass over the recon join —
    // both counts in a single aggregate, two rows exploded from it
    val reconRows = ordRecon.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("sum_u").isNull ||
            abs(c2("o_totalprice") * lit(10000L) - col("sum_u")) > lit(10000L),
          1L).otherwise(0L)), lit(0L)).as("bad_recon"),
        coalesce(sum(when(col("sum_u").isNull, 1L).otherwise(0L)), lit(0L))
          .as("bad_cov"))
      .select(explode(array(
        rowOf("reconcile_totalprice", "reconcile", "bad_recon"),
        rowOf("coverage_orders_lineitem", "coverage", "bad_cov"))).as("_r"))
      .select(col("_r.check"), col("_r.kind"),
        col("_r.n_checked"), col("_r.n_bad"))

    Seq(liRows, ordCust, evCust, uOrd, uLi, reconRows)
      .reduce(_ unionByName _)
      .withColumn("ok", col("n_bad") === 0L)
      .orderBy("check")
  }

  /** q208: per-source winsorization — the robust-stats feature prep
    * (outlier clipping) every tabular/feature pipeline runs before
    * training on heavy-tailed measures: clip each document's `n_chars`
    * to its source's [p05, p95] band and report per-source raw vs
    * winsorized totals and clip counts.
    *
    * Exactness: the thresholds are LOWER quantiles — the ACTUAL value
    * at 1-based sorted position ⌈q·n⌉ (q202's lower-median discipline
    * generalized), never an interpolated double — so thresholds,
    * clipped values, and all sums are exact integers in both engines.
    *
    * Scale shape: q37's machinery, not a per-source window — `source`
    * is a LOW-cardinality key, so a `Window.partitionBy(source)` rank
    * would put each source's whole corpus slice in ONE task; instead
    * ranks come from a ScalableRank two-pass global row number over
    * (source, n_chars), in-cell positions via the broadcast per-source
    * (base, n) table, and the thresholds broadcast back onto the scan
    * for a map-side clip + partial/final aggregate. */
  def q208Winsorize(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents").select(col("source"), col("n_chars"))
    val ranked = ScalableRank.withGlobalRowNumber(
      docs, "_grn", col("source"), col("n_chars"))
    val stats = ranked.groupBy(col("source").as("_g"))
      .agg(min("_grn").as("_base"), count(lit(1)).as("_n"))
      // 1-based lower-quantile positions: ⌈n/20⌉ and ⌈19n/20⌉
      .withColumn("_plo", expr("(_n + 19) div 20"))
      .withColumn("_phi", expr("(19 * _n + 19) div 20"))
    val thresholds = ranked
      .join(broadcast(stats), col("source") === col("_g"))
      .withColumn("_rn", col("_grn") - col("_base") + 1)
      .filter(col("_rn") === col("_plo") || col("_rn") === col("_phi"))
      .groupBy(col("source").as("_ts"))
      .agg(max(when(col("_rn") === col("_plo"), col("n_chars"))).as("p05"),
        max(when(col("_rn") === col("_phi"), col("n_chars"))).as("p95"))
    docs.join(broadcast(thresholds), col("source") === col("_ts"))
      .withColumn("w", greatest(col("p05"), least(col("p95"), col("n_chars"))))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        max("p05").as("p05"), max("p95").as("p95"),
        sum(when(col("n_chars") < col("p05"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("n_chars") > col("p95"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum("n_chars").as("sum_raw"), sum("w").as("sum_winsorized"))
      .orderBy("source")
  }

  /** q223: WEIGHTED quantiles per source — the mass-weighted companion
    * of q208's row quantiles: "the document length below which half /
    * 90% of the source's TOKEN MASS sits". Row quantiles mislead on
    * skewed corpora (a million tiny docs dominate the row count while
    * a few huge docs hold the mass — the context-window and storage
    * questions are about MASS); every token-budget decision (q150's
    * mixes, q112's chunking) wants the weighted form.
    *
    * Definition (exact, both engines): the weighted lower p-quantile is
    * the SMALLEST value v whose inclusive cumulative weight reaches
    * p·W, decided by integer cross-multiplication — `2·cum ≥ W` (p50),
    * `10·cum ≥ 9·W` (p90) — never a division.
    *
    * Scale shape: q208's lesson with a weight column — collapse to the
    * per-(source, value) weight first (vocab-of-values-sized), ONE
    * ScalableRank global EXCLUSIVE cumsum over the composite
    * (source, n_chars) key (the distributed prefix scan — never a
    * per-source window on a low-cardinality key), per-source offsets
    * and totals via a broadcast (base, W) table (q208's min-base
    * trick applied to weight), then one aggregate picks both quantile
    * values with min(when(...)). Output is source-count-sized. */
  def q223WeightedQuantile(s: SparkSession, dir: String): DataFrame = {
    // NULL value/text rows carry no mass and would split the sort-order
    // contract (Spark seats NULLs first, DuckDB's window default last —
    // q219's discipline) and the weight contract (Spark legacy
    // size(NULL) = −1 vs DuckDB NULL) — excluded identically
    val byValue = T(s, dir, "documents")
      .select(col("source"), col("n_chars"),
        expr(Curation.WordCountSql).as("w"))
      .filter(col("n_chars").isNotNull && col("w") >= 0L)
      .groupBy("source", "n_chars").agg(sum("w").as("sw"))
    val cum = ScalableRank.withGlobalCumsumExclusive(
      byValue, col("sw"), "_cx", col("source"), col("n_chars"))
    val stats = cum.groupBy(col("source").as("_g"))
      .agg(min("_cx").as("_base"), sum("sw").as("_W"))
    cum.join(broadcast(stats), col("source") === col("_g"))
      .withColumn("_cum", col("_cx") - col("_base") + col("sw"))
      .groupBy("source")
      .agg(max("_W").as("w_total"),
        min(when(col("_cum") * 2 >= col("_W"), col("n_chars")))
          .as("wp50_chars"),
        min(when(col("_cum") * 10 >= col("_W") * 9, col("n_chars")))
          .as("wp90_chars"))
      .orderBy("source")
  }

  /** The deterministic missingness ticket under q254 — the md5-ticket
    * discipline (q89/q216) standing in for real-world nulls: ~1/7 of
    * customers lose their balance. */
  private[ops] val MissTicket =
    "cast(conv(substring(md5(concat('miss:', cast(c_custkey as string))), " +
      "1, 12), 16, 10) as bigint) % 7 = 0"

  /** q254: group-median NULL imputation — the tabular data-repair step
    * every feature pipeline runs before training on columns with
    * missing values (q101 forward-fills a TIME SERIES from each key's
    * own history; a plain tabular column has no history — the standard
    * repair is the GROUP's robust center). Balance is nulled for the
    * [[MissTicket]] cohort (derived missingness — deterministic,
    * cross-engine), then every null takes its market segment's LOWER
    * median of the non-null balances (exact integer cents at sorted
    * position ⌈n/2⌉ — q202/q208's interpolation-free discipline; median
    * not mean, so the repair value is not dragged by the tails it will
    * sit among). Output per segment: rows, missing count, the
    * imputation value, and the sums before/after repair — the audit row
    * a feature-store backfill logs.
    *
    * Scale shape: q208's lesson verbatim — segment is LOW-cardinality,
    * so the rank comes from ONE ScalableRank two-pass global row number
    * over (segment, balance), per-segment positions via the broadcast
    * (base, n) table, and the 5-row median table broadcasts back onto
    * the full scan for a map-side fill + partial/final aggregate. No
    * per-segment window ever sees a segment's whole slice in one
    * task. */
  def q254ImputeMedian(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"),
        when(expr(MissTicket), lit(null))
          .otherwise(expr("cast(round(c_acctbal * 100) as bigint)"))
          .as("bal"))
    val nn = d.filter(col("bal").isNotNull)
    val ranked = ScalableRank.withGlobalRowNumber(
      nn, "_grn", col("seg"), col("bal"))
    val stats = ranked.groupBy(col("seg").as("_g"))
      .agg(min("_grn").as("_base"), count(lit(1)).as("_n"))
      .withColumn("_pmed", expr("(_n + 1) div 2"))
    val medians = ranked
      .join(broadcast(stats), col("seg") === col("_g"))
      .filter(col("_grn") - col("_base") + 1 === col("_pmed"))
      .groupBy(col("seg").as("_ms"))
      .agg(max("bal").as("med")) // the position is unique; max collapses it
    d.join(broadcast(medians), col("seg") === col("_ms"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("bal").isNull, 1L).otherwise(0L)).as("n_missing"),
        max("med").as("median_c2"),
        sum("bal").as("sum_before_c2"),
        sum(coalesce(col("bal"), col("med"))).as("sum_after_c2"))
      .orderBy("seg")
  }

  /** Benford first-digit expectations ⌊log₁₀(1+1/d)·10⁴⌋ bp, d = 1–9 —
    * a fixed constant table (sums to 9995; the missing bp are the
    * per-digit floors), interpolated into BOTH engines so the law itself can
    * never drift between them. */
  private[ops] val BenfordBp =
    Seq(3010L, 1760L, 1249L, 969L, 791L, 669L, 579L, 511L, 457L)

  /** q278: Benford first-digit audit — the forensic-accounting screen
    * (fraud teams run it over journal entries; fabricated amounts skew
    * toward mid digits): the distribution of leading significant
    * digits of order amounts against Benford's law, per digit: observed
    * count, observed share (bp), expected share (bp), absolute
    * deviation (bp). The verdict threshold is the CONSUMER's (audit
    * policy); this op is the measurement — and on TPC-H's
    * uniform-generated prices the deviation is predictably LARGE,
    * which is exactly what the audit should say about synthetic data
    * (BenfordSpec pins that it does).
    *
    * The first digit of an integer-cents amount is engine-exact
    * (leading char of the BIGINT's decimal rendering — no float log,
    * no locale); one scan, one 9-row aggregate, one 1-row total
    * broadcast back. */
  def q278BenfordAudit(s: SparkSession, dir: String): DataFrame = {
    val obs = T(s, dir, "orders")
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("c2"))
      .filter(col("c2") > 0)
      .withColumn("digit", expr("cast(substring(cast(c2 as string), 1, 1) as int)"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = obs.agg(sum("n")).collect()(0).getLong(0)
    val exp = BenfordBp.zipWithIndex
      .map { case (bp, i) => s"when digit = ${i + 1} then ${bp}L" }
      .mkString("case ", " ", " end")
    obs
      .withColumn("share_bp", expr(s"(n * 10000) div ${tot}L"))
      .withColumn("benford_bp", expr(exp))
      .withColumn("dev_bp", expr("abs(share_bp - benford_bp)"))
      .orderBy("digit")
  }

  /** q280: return-rate ranking by LOWER CONFIDENCE BOUND — the
    * small-sample ranking discipline (Evan Miller's "how not to sort by
    * average rating", the Wilson/Agresti–Coull move): per (brand, size)
    * cell, the raw return rate over-ranks tiny cells (2 of 3 returned
    * beats 300 of 1000 on raw rate; it must not), so cells rank by
    * p̃ − 2·σ̃ with p̃ = (x+2)/(n+4) — the +2/+4 shrinkage prior plus a
    * two-sigma penalty that grows as n shrinks.
    *
    * Everything is exact integer arithmetic: p̃ in bp by floor
    * division, σ̃·10⁴ = isqrt(p̃_bp·(10⁴−p̃_bp) div (n+4)) with the
    * ⌊√·⌋ computed as the double estimate corrected by the ±2
    * monotone candidate window (the FixQuantum/q160 isqrt discipline —
    * no float comparison survives to the output). One lineitem⋈part
    * broadcast join, one cell-sized partial+final aggregate, one
    * codegen'd projection. AuditLcbSpec pins a BigInt-sqrt recompute
    * AND the reason to exist: some cell pair ranks differently by raw
    * rate than by LCB. */
  def q280ReturnRateLcb(s: SparkSession, dir: String): DataFrame = {
    val cells = T(s, dir, "lineitem")
      .select(col("l_partkey"),
        (col("l_returnflag") === "R").cast("long").as("r"))
      .join(broadcast(T(s, dir, "part")
        .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(count(lit(1)).as("n"), sum("r").as("x"))
    cells
      .withColumn("p_bp", expr("((x + 2) * 10000) div (n + 4)"))
      .withColumn("vv", expr("(p_bp * (10000 - p_bp)) div (n + 4)"))
      .withColumn("t0", expr("cast(floor(sqrt(cast(vv as double))) as bigint)"))
      .withColumn("sig", expr(
        "t0 - 2 + (case when t0 - 1 < 0 or (t0-1)*(t0-1) <= vv then 1 else 0 end)" +
          " + (case when t0 < 0 or t0*t0 <= vv then 1 else 0 end)" +
          " + (case when (t0+1)*(t0+1) <= vv then 1 else 0 end)" +
          " + (case when (t0+2)*(t0+2) <= vv then 1 else 0 end)"))
      .withColumn("lcb_bp", greatest(lit(0L), expr("p_bp - 2 * sig")))
      .select("p_brand", "p_size", "n", "x", "p_bp", "lcb_bp")
      .orderBy("p_brand", "p_size")
  }

  /** q287: dimension ACTIVITY census — the reverse of q207's FK checks
    * (children must have parents): how much of each DIMENSION did the
    * facts touch in the trailing window (the data's final calendar
    * year — production passes its window)? Inactive members are not
    * errors — they are cost and risk (an untouched dimension member
    * still broadcasts, still SCD2-versions, still gets GDPR-swept),
    * they gate archiving decisions, and a falling active share is the
    * q202-class signal that a feed stopped writing. One row per
    * dimension: members, active, inactive, active share (bp).
    * (All-history referencing is vacuous on this generator — every
    * member is referenced — which is itself the reason real censuses
    * are WINDOWED.)
    *
    * Scale shape: per dimension, the windowed FACT key set collapses
    * FIRST (filter + distinct partial+final — a key-only shuffle),
    * then a membership left join and one 1-row count; the three
    * dimension rows union. Never a fact-sized join output. */
  def q287DimUsage(s: SparkSession, dir: String): DataFrame = {
    // one cutoff scalar per (fact, dateCol) — the part and supplier
    // censuses share lineitem's, so the fact is not re-scanned for the
    // same scalar once per dimension
    val yearOf = scala.collection.mutable.Map.empty[(String, String), Int]
    def census(dim: DataFrame, key: String, fact: DataFrame,
               fkey: String, factName: String, dateCol: String,
               name: String): DataFrame = {
      val yr = yearOf.getOrElseUpdate((factName, dateCol),
        fact.agg(max(expr(s"year($dateCol)"))).collect()(0).getInt(0))
      val active = fact.filter(expr(s"year($dateCol) = $yr"))
        .select(col(fkey).as("_fk")).distinct()
      dim.select(col(key).as("_k"))
        .join(active, col("_k") === col("_fk"), "left")
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("_fk").isNotNull, 1L).otherwise(0L)).as("n_active"))
        .select(lit(name).as("dim"), col("n_members"), col("n_active"),
          (col("n_members") - col("n_active")).as("n_inactive"),
          expr("(n_active * 10000) div n_members").as("active_bp"))
    }
    census(T(s, dir, "customer"), "c_custkey",
        T(s, dir, "orders"), "o_custkey", "orders", "o_orderdate", "customer")
      .unionByName(census(T(s, dir, "part"), "p_partkey",
        T(s, dir, "lineitem"), "l_partkey", "lineitem", "l_shipdate", "part"))
      .unionByName(census(T(s, dir, "supplier"), "s_suppkey",
        T(s, dir, "lineitem"), "l_suppkey", "lineitem", "l_shipdate",
        "supplier"))
      .orderBy("dim")
  }

  /** q293 double-posting ticket: ~2.7% of payment lines are re-posted
    * 3 days later under a shifted document key. */
  private[ops] val DupMod = 37L
  private[ops] val DupDocOffset = 2000000000L
  private[ops] val DupWindowDays = 7

  /** q293: duplicate-payment detection — the AP-audit staple (every
    * payment-recovery firm's first query): two postings to the SAME
    * supplier for the SAME amount within a short window are duplicate
    * candidates. Exact-amount blocking is what makes this scan-shaped
    * at 100 TB: the self-join keys on (supplier, cents), so the pair
    * generator is bounded by per-(supplier, amount) multiplicity — on
    * real integer-cents data collisions are rare (on THIS generator,
    * zero: the fixture's upstream injects ticket-derived double
    * postings — mod [[DupMod]] lines re-posted [[DupWindowDays]]−4
    * days later under a document key shifted by [[DupDocOffset]] — and
    * the detector's job is to find exactly those, which the spec and
    * oracle independently confirm it does, plus nothing else).
    * Output per supplier: payments, flagged pairs, cents at risk (the
    * later posting of each pair).
    *
    * Scale note: amount-blocked self-joins degrade only when one
    * (supplier, amount) key is hot (recurring fixed fees) — cap the
    * block like q78's maxDf and route hot blocks to review. */
  def q293DupPayments(s: SparkSession, dir: String): DataFrame = {
    val tick = "cast(conv(substring(md5(concat('dup:', " +
      "cast(doc as string), ':', cast(ln as string))), " +
      "1, 12), 16, 10) as bigint)"
    val base = T(s, dir, "lineitem")
      .select(col("l_suppkey").as("sk"), col("l_orderkey").as("doc"),
        col("l_linenumber").as("ln"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c2"),
        expr("cast(l_shipdate as date)").as("d"))
      .groupBy("sk", "doc", "ln")
      .agg(sum("c2").as("c2"), min("d").as("d"))
    val reposts = base.filter(expr(s"$tick % $DupMod = 0"))
      .select(col("sk"), (col("doc") + DupDocOffset).as("doc"), col("ln"),
        col("c2"), expr(s"date_add(d, ${DupWindowDays - 4})").as("d"))
    val pays = base.unionByName(reposts)
    val a = pays.select(col("sk"), col("c2"), col("doc").as("doc1"),
      col("ln").as("ln1"), col("d").as("d1"))
    val b = pays.select(col("sk"), col("c2"), col("doc").as("doc2"),
      col("ln").as("ln2"), col("d").as("d2"))
    val pairs = a.join(b, Seq("sk", "c2"))
      .filter(expr("(doc1 < doc2 or (doc1 = doc2 and ln1 < ln2)) and " +
        s"abs(datediff(d2, d1)) <= $DupWindowDays"))
    pays.groupBy("sk").agg(count(lit(1)).as("n_payments"))
      .join(pairs.groupBy("sk")
        .agg(count(lit(1)).as("n_dup_pairs"), sum("c2").as("at_risk_c2")),
        Seq("sk"), "left")
      .select(col("sk").as("l_suppkey"), col("n_payments"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("at_risk_c2"), lit(0L)).as("at_risk_c2"))
      .orderBy("l_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q293_dup_payments" -> q293DupPayments _,
    "q287_dim_usage" -> q287DimUsage _,
    "q280_return_rate_lcb" -> q280ReturnRateLcb _,
    "q207_integrity_audit" -> q207IntegrityAudit _,
    "q208_winsorize" -> q208Winsorize _,
    "q223_weighted_quantile" -> q223WeightedQuantile _,
    "q254_impute_median" -> q254ImputeMedian _,
    "q278_benford_audit" -> q278BenfordAudit _,
  )

  val oracle: Map[String, String] = Map(
    // q293: the same injected reposts, the same (supplier, cents)
    // blocking, pair order, and window predicate
    "q293_dup_payments" ->
      s"""WITH base AS (SELECT l_suppkey AS sk, l_orderkey AS doc,
        |                l_linenumber AS ln,
        |                sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS c2,
        |                min(CAST(l_shipdate AS DATE)) AS d
        |              FROM lineitem GROUP BY 1, 2, 3),
        |rep AS (SELECT sk, doc + $DupDocOffset AS doc, ln, c2,
        |          d + to_days(${DupWindowDays - 4}) AS d
        |        FROM base
        |        WHERE ('0x' || substr(md5('dup:' || doc::VARCHAR || ':' ||
        |                ln::VARCHAR), 1, 12))::BIGINT % $DupMod = 0),
        |pays AS (SELECT * FROM base UNION ALL SELECT * FROM rep),
        |pairs AS (SELECT a.sk, a.c2
        |          FROM pays a JOIN pays b ON a.sk = b.sk AND a.c2 = b.c2
        |            AND (a.doc < b.doc OR (a.doc = b.doc AND a.ln < b.ln))
        |            AND abs(datediff('day', a.d, b.d)) <= $DupWindowDays),
        |agg AS (SELECT sk, count(*) AS n_dup_pairs, sum(c2) AS at_risk_c2
        |        FROM pairs GROUP BY 1)
        |SELECT p.sk AS l_suppkey, count(*) AS n_payments,
        |       CAST(COALESCE(max(a.n_dup_pairs), 0) AS BIGINT) AS n_dup_pairs,
        |       CAST(COALESCE(max(a.at_risk_c2), 0) AS BIGINT) AS at_risk_c2
        |FROM pays p LEFT JOIN agg a ON p.sk = a.sk
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q287: the same derived final-year window and membership shape
    "q287_dim_usage" ->
      """WITH oy AS (SELECT max(year(o_orderdate)) AS y FROM orders),
        |ly AS (SELECT max(year(l_shipdate)) AS y FROM lineitem),
        |c AS (SELECT count(*) AS m,
        |        sum(CASE WHEN c_custkey IN (SELECT o_custkey FROM orders, oy
        |                                    WHERE year(o_orderdate) = oy.y)
        |            THEN 1 ELSE 0 END) AS r FROM customer),
        |p AS (SELECT count(*) AS m,
        |        sum(CASE WHEN p_partkey IN (SELECT l_partkey FROM lineitem, ly
        |                                    WHERE year(l_shipdate) = ly.y)
        |            THEN 1 ELSE 0 END) AS r FROM part),
        |s AS (SELECT count(*) AS m,
        |        sum(CASE WHEN s_suppkey IN (SELECT l_suppkey FROM lineitem, ly
        |                                    WHERE year(l_shipdate) = ly.y)
        |            THEN 1 ELSE 0 END) AS r FROM supplier),
        |u AS (SELECT 'customer' AS dim, m, r FROM c
        |      UNION ALL SELECT 'part', m, r FROM p
        |      UNION ALL SELECT 'supplier', m, r FROM s)
        |SELECT dim, CAST(m AS BIGINT) AS n_members,
        |       CAST(r AS BIGINT) AS n_active,
        |       CAST(m - r AS BIGINT) AS n_inactive,
        |       CAST((r * 10000) // m AS BIGINT) AS active_bp
        |FROM u ORDER BY dim""".stripMargin,
    // q280: identical shrinkage, floors, and the ±2-corrected isqrt
    "q280_return_rate_lcb" ->
      """WITH cells AS (SELECT p.p_brand, p.p_size, count(*) AS n,
        |                 sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS x
        |               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |               GROUP BY 1, 2),
        |e AS (SELECT p_brand, p_size, n, x,
        |        ((x + 2) * 10000) // (n + 4) AS p_bp,
        |        (((x + 2) * 10000) // (n + 4) * (10000 - ((x + 2) * 10000) // (n + 4)))
        |          // (n + 4) AS vv
        |      FROM cells),
        |s AS (SELECT *, CAST(floor(sqrt(CAST(vv AS DOUBLE))) AS BIGINT) AS t0 FROM e),
        |c AS (SELECT p_brand, p_size, n, x, p_bp,
        |        t0 - 2
        |        + (CASE WHEN t0 - 1 < 0 OR (t0-1)*(t0-1) <= vv THEN 1 ELSE 0 END)
        |        + (CASE WHEN t0 < 0 OR t0*t0 <= vv THEN 1 ELSE 0 END)
        |        + (CASE WHEN (t0+1)*(t0+1) <= vv THEN 1 ELSE 0 END)
        |        + (CASE WHEN (t0+2)*(t0+2) <= vv THEN 1 ELSE 0 END) AS sig
        |      FROM s)
        |SELECT p_brand, CAST(p_size AS INTEGER) AS p_size,
        |       CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
        |       CAST(p_bp AS BIGINT) AS p_bp,
        |       CAST(greatest(0, p_bp - 2 * sig) AS BIGINT) AS lcb_bp
        |FROM c ORDER BY 1, 2""".stripMargin,
    // q278: the same decimal-rendering first digit, the same constant
    // expectation table (one Seq, interpolated into both engines)
    "q278_benford_audit" -> {
      val exp = BenfordBp.zipWithIndex
        .map { case (bp, i) => s"WHEN digit = ${i + 1} THEN $bp" }
        .mkString("CASE ", " ", " END")
      s"""WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c2
        |           FROM orders WHERE round(o_totalprice * 100) > 0),
        |d AS (SELECT CAST(substr(c2::VARCHAR, 1, 1) AS INTEGER) AS digit FROM o),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT sum(n) AS tot FROM g)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        |       CAST((n * 10000) // tot AS BIGINT) AS share_bp,
        |       CAST($exp AS BIGINT) AS benford_bp,
        |       CAST(abs((n * 10000) // tot - ($exp)) AS BIGINT) AS dev_bp
        |FROM g, t ORDER BY digit""".stripMargin
    },
    // q254: the identical derived missingness (same md5 ticket), lower
    // median at the same 1-based position, same fill — per-segment
    // windows are fine at oracle scale
    "q254_impute_median" ->
      """WITH d AS (SELECT c_mktsegment AS seg,
        |             CASE WHEN ('0x' || substr(md5('miss:' || c_custkey::VARCHAR), 1, 12))::BIGINT % 7 = 0
        |                  THEN NULL
        |                  ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS bal
        |           FROM customer),
        |nn AS (SELECT seg, bal,
        |         row_number() OVER (PARTITION BY seg ORDER BY bal) AS rn,
        |         count(*) OVER (PARTITION BY seg) AS n
        |       FROM d WHERE bal IS NOT NULL),
        |m AS (SELECT seg, max(CASE WHEN rn = (n + 1) // 2 THEN bal END) AS med
        |      FROM nn GROUP BY 1)
        |SELECT d.seg, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN d.bal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        |       CAST(max(m.med) AS BIGINT) AS median_c2,
        |       CAST(sum(d.bal) AS BIGINT) AS sum_before_c2,
        |       CAST(sum(coalesce(d.bal, m.med)) AS BIGINT) AS sum_after_c2
        |FROM d JOIN m ON d.seg = m.seg
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q223: identical weighted lower quantiles — inclusive per-source
    // weight cumsum in value order, integer cross-multiplied pick
    "q223_weighted_quantile" ->
      s"""WITH d AS (SELECT source, n_chars,
        |             CAST(${Curation.WordCountDuck} AS BIGINT) AS w
        |           FROM documents
        |           WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |v AS (SELECT source, n_chars, sum(w) AS sw FROM d GROUP BY 1, 2),
        |c AS (SELECT source, n_chars, sw,
        |        sum(sw) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
        |        sum(sw) OVER (PARTITION BY source) AS W
        |      FROM v)
        |SELECT source, CAST(max(W) AS BIGINT) AS w_total,
        |       min(CASE WHEN cum * 2 >= W THEN n_chars END) AS wp50_chars,
        |       min(CASE WHEN cum * 10 >= W * 9 THEN n_chars END) AS wp90_chars
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // q208: identical lower-quantile positions (value at row ⌈q·n⌉ per
    // source) — integer thresholds, integer clip, integer sums
    "q208_winsorize" ->
      """WITH r AS (SELECT source, n_chars,
        |             row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |             count(*) OVER (PARTITION BY source) AS n
        |           FROM documents),
        |t AS (SELECT source,
        |        max(CASE WHEN rn = (n + 19) // 20 THEN n_chars END) AS p05,
        |        max(CASE WHEN rn = (19 * n + 19) // 20 THEN n_chars END) AS p95
        |      FROM r GROUP BY 1)
        |SELECT d.source, count(*) AS n,
        |  max(t.p05) AS p05, max(t.p95) AS p95,
        |  CAST(sum(CASE WHEN d.n_chars < t.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(sum(CASE WHEN d.n_chars > t.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  CAST(sum(d.n_chars) AS BIGINT) AS sum_raw,
        |  CAST(sum(greatest(t.p05, least(t.p95, d.n_chars))) AS BIGINT) AS sum_winsorized
        |FROM documents d JOIN t USING (source)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // q207: the same 11 constraints; integer-cents reconciliation via
    // the identical floor(x*100+0.5) chain
    "q207_integrity_audit" ->
      """WITH li AS (
        |  SELECT l.*, o.o_orderkey AS p_ok, o.o_orderdate AS p_odate,
        |         p.p_partkey AS p_pk, s.s_suppkey AS p_sk
        |  FROM lineitem l
        |  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |  LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |liagg AS (SELECT count(*) AS n,
        |  sum(CASE WHEN p_ok IS NULL THEN 1 ELSE 0 END) AS bad_fk_ord,
        |  sum(CASE WHEN p_pk IS NULL THEN 1 ELSE 0 END) AS bad_fk_part,
        |  sum(CASE WHEN p_sk IS NULL THEN 1 ELSE 0 END) AS bad_fk_supp,
        |  sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS bad_disc,
        |  sum(CASE WHEN p_ok IS NOT NULL AND l_shipdate < p_odate THEN 1 ELSE 0 END) AS bad_ship
        |  FROM li),
        |charges AS (
        |  SELECT l_orderkey,
        |         sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
        |             * (100 - CAST(floor(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
        |             * (100 + CAST(floor(CAST(l_tax AS DOUBLE) * 100.0 + 0.5) AS BIGINT))) AS sum_u
        |  FROM lineitem GROUP BY 1),
        |ordrecon AS (
        |  SELECT o.o_orderkey, o.o_totalprice, c.sum_u
        |  FROM orders o LEFT JOIN charges c ON o.o_orderkey = c.l_orderkey),
        |rows AS (
        |  SELECT 'fk_lineitem_orderkey' AS "check", 'fk' AS kind, n AS n_checked, bad_fk_ord AS n_bad FROM liagg
        |  UNION ALL SELECT 'fk_lineitem_partkey', 'fk', n, bad_fk_part FROM liagg
        |  UNION ALL SELECT 'fk_lineitem_suppkey', 'fk', n, bad_fk_supp FROM liagg
        |  UNION ALL SELECT 'rule_discount_range', 'rule', n, bad_disc FROM liagg
        |  UNION ALL SELECT 'rule_ship_after_order', 'rule', n, bad_ship FROM liagg
        |  UNION ALL SELECT 'fk_orders_custkey', 'fk', count(*),
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL SELECT 'fk_events_userid', 'fk', count(*),
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |  UNION ALL SELECT 'unique_orders_orderkey', 'unique', sum(kn),
        |    sum(CASE WHEN kn > 1 THEN kn ELSE 0 END)
        |    FROM (SELECT count(*) AS kn FROM orders GROUP BY o_orderkey)
        |  UNION ALL SELECT 'unique_lineitem_line', 'unique', sum(kn),
        |    sum(CASE WHEN kn > 1 THEN kn ELSE 0 END)
        |    FROM (SELECT count(*) AS kn FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |  UNION ALL SELECT 'reconcile_totalprice', 'reconcile', count(*),
        |    sum(CASE WHEN sum_u IS NULL OR
        |        abs(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) * 10000
        |            - sum_u) > 10000 THEN 1 ELSE 0 END)
        |    FROM ordrecon
        |  UNION ALL SELECT 'coverage_orders_lineitem', 'coverage', count(*),
        |    sum(CASE WHEN sum_u IS NULL THEN 1 ELSE 0 END)
        |    FROM ordrecon)
        |SELECT "check", kind, CAST(n_checked AS BIGINT) AS n_checked,
        |       CAST(n_bad AS BIGINT) AS n_bad, n_bad = 0 AS ok
        |FROM rows ORDER BY "check"""".stripMargin,
  )
}
