package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-governance operations — the compliance surface a warehouse (and
  * every training-data store holding user-derived rows) runs on demand:
  * right-to-be-forgotten delete propagation across the foreign-key
  * graph, with an auditable per-table account of what a deletion batch
  * touches BEFORE anything is rewritten.
  */
object Governance {

  /** The deterministic deletion cohort: ~6% of customers (1/16), selected by
    * the repo's md5-ticket discipline (`conv(md5, 16, 10) % 16 = 0` —
    * the same hex-prefix BIGINT both engines compute identically).
    * Stands in for the externally-supplied erasure list a real GDPR
    * batch carries. */
  private def delTicket(key: String): String =
    s"cast(conv(substring(md5(concat('del:', cast($key as string))), 1, 12), " +
      s"16, 10) as bigint) % 16 = 0"

  /** q216: cascade-delete audit — given the customer erasure cohort,
    * propagate it through the FK graph (customer → orders → lineitem;
    * customer → events) and report, per table, how many rows the
    * deletion batch removes and how many survive: `(tbl, n_rows,
    * n_deleted, n_kept)`, one row per table. This is the dry-run every
    * delete pipeline executes first — the counts are the audit record,
    * and the surviving-row predicate is exactly the anti-join a
    * subsequent rewrite applies.
    *
    * Scale shape: ONE audit scan per table plus exactly two derivation
    * passes — the cohort build (one customer scan, localCheckpointed so
    * the three consumers read the materialized key set instead of
    * re-scanning customer each) and the deleted-order key derivation
    * (one orders scan) — six scans total, q207's one-sweep-per-table
    * discipline. The key sets stay distributed end-to-end: customer
    * keys are erasure-cohort-sized (~6%), the derived deleted-ORDER key
    * set is produced by a semi-join and never touches the driver; joins
    * are plain equi-joins Spark sizes itself (broadcast at this SF,
    * shuffle-hash at 10⁹-customer scale — nothing is force-broadcast
    * precisely because an erasure cohort over 100 TB customers is NOT
    * driver-bounded). Output is 4 rows. */
  def q216CascadeDelete(s: SparkSession, dir: String): DataFrame = {
    def cnt(df: DataFrame, tbl: String, deleted: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(deleted, 1L).otherwise(0L)), lit(0L))
            .as("n_deleted"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("n_deleted"),
          (col("n_rows") - col("n_deleted")).as("n_kept"))

    val cust = T(s, dir, "customer")
    val custDel = expr(delTicket("c_custkey"))
    val delKeys = cust.filter(custDel).select(col("c_custkey").as("k"))
      .localCheckpoint(true) // 3 consumers — build the cohort ONCE

    val orders = T(s, dir, "orders").select("o_orderkey", "o_custkey")
    val ordJoined = orders.join(delKeys, col("o_custkey") === col("k"), "left")
    val ordDelKeys = orders
      .join(delKeys, col("o_custkey") === col("k"), "left_semi")
      .select(col("o_orderkey").as("ok"))

    Seq(
      cnt(cust, "customer", custDel),
      cnt(ordJoined, "orders", col("k").isNotNull),
      cnt(T(s, dir, "lineitem").select("l_orderkey")
          .join(ordDelKeys, col("l_orderkey") === col("ok"), "left"),
        "lineitem", col("ok").isNotNull),
      cnt(T.events(s, dir).select("user_id")
          .join(delKeys, col("user_id") === col("k"), "left"),
        "events", col("k").isNotNull))
      .reduce(_ unionByName _)
      .orderBy("tbl")
  }

  private[ops] val KAnon = 5L        // the k in k-anonymity
  private[ops] val BandC2 = 100000L  // $1000 balance bands (cents)

  /** q237: k-anonymity audit — the re-identification-risk gauge that
    * complements q111 (PII scrub) and q216 (erasure propagation): under
    * the quasi-identifier tuple (nation, market segment, $1000 balance
    * band), how many equivalence classes does the customer table
    * partition into, how many violate k = [[KAnon]] (fewer than k
    * indistinguishable members), and how many rows those violating
    * classes expose? A release gate reads `rows_at_risk` the way q224
    * reads its checks: 0 means every customer hides in a crowd of ≥ k.
    *
    * Semantics: balances ride integer cents (the q183 `round(×100)`
    * cast) and the band divides `bal_c2 + 10⁶` — the offset keeps the
    * dividend positive for every in-contract balance (≥ −$10,000), so
    * Spark's `div` and DuckDB's `//` cannot diverge on negative
    * truncation (the T.tus ≥ 0 argument applied to money).
    *
    * Scale shape: groupBy(QI) count → groupBy(segment) rollup — two
    * partial+final aggregates, no window, no driver materialization;
    * the first shuffle is class-count-sized, the second
    * segment-count-sized. Output: one row per market segment
    * `(c_mktsegment, n_classes, n_violating, rows_at_risk, n_rows)`. */
  def q237KAnonymity(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        expr(s"(cast(round(c_acctbal * 100) as bigint) + 1000000) div $BandC2")
          .as("bal_band"))
      .groupBy("c_mktsegment", "c_nationkey", "bal_band")
      .agg(count(lit(1)).as("n"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < KAnon, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("n") < KAnon, col("n")).otherwise(0L))
          .as("rows_at_risk"),
        sum("n").as("n_rows"))
      .orderBy("c_mktsegment")

  /** The ladder's per-level band widths in cents — each level widens the
    * balance band 4× over the one before; levels 2+ also coarsen nation
    * to REGION, level 3 drops the segment, level 4 generalizes
    * everything to one class. One Seq interpolated into BOTH engines so
    * the rungs can never drift. */
  private[ops] val LadderBandsC2 = Seq(100000L, 400000L, 1600000L, 6400000L)

  /** q253: k-anonymity GENERALIZATION ladder — the deciding half of the
    * privacy story q237 only measures: given a fixed sequence of
    * increasingly coarse quasi-identifier representations (the
    * Mondrian/Datafly move, with a pinned deterministic ladder instead
    * of a data-driven cut search), evaluate every rung and mark the
    * MINIMAL one whose release satisfies k = [[KAnon]] — "how much
    * detail can we publish". Rungs: L0 = q237's QI (nation, segment,
    * $1k band); L1 widens the band 4×; L2 coarsens nation→region; L3
    * drops segment; L4 is the single-class full generalization (always
    * satisfiable, so a minimal rung always exists). Output one audit
    * row per rung — classes, violating classes, rows at risk, meets_k,
    * chosen — the table a data-release review actually signs off on.
    *
    * Non-monotonicity note: rows_at_risk need NOT decrease monotonically
    * rung to rung (merging classes can assemble NEW sub-k classes from
    * scraps), which is exactly why every rung is evaluated rather than
    * binary-searched.
    *
    * Scale shape: ONE customer scan (broadcast 25-row nation join)
    * exploded ×5 into (rung, qi) — the grouping-sets Expand shape, 5
    * narrow string rows per customer — then two chained partial+final
    * aggregates (class counts → rung rollup); the minimal-rung pick is
    * a 1-row broadcast crossJoin (q218's class). No window, no driver
    * loop; the first shuffle is class-count-sized × 5. */
  def q253GeneralizeLadder(s: SparkSession, dir: String): DataFrame = {
    val b = LadderBandsC2
    val c = T(s, dir, "customer")
      .join(broadcast(T(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nk"),
        col("n_regionkey").as("rk"),
        // q237's offset-positive cents (dividends stay ≥ 0, so div
        // and // cannot diverge on truncation direction)
        expr("cast(round(c_acctbal * 100) as bigint) + 1000000").as("balp"))
    val rungs = array(
      struct(lit(0).as("lvl"),
        concat_ws("|", col("nk"), col("seg"), expr(s"balp div ${b(0)}")).as("qi")),
      struct(lit(1).as("lvl"),
        concat_ws("|", col("nk"), col("seg"), expr(s"balp div ${b(1)}")).as("qi")),
      struct(lit(2).as("lvl"),
        concat_ws("|", col("rk"), col("seg"), expr(s"balp div ${b(2)}")).as("qi")),
      struct(lit(3).as("lvl"),
        concat_ws("|", col("rk"), expr(s"balp div ${b(3)}")).as("qi")),
      struct(lit(4).as("lvl"), lit("*").as("qi")))
    val lvls = c.select(explode(rungs).as("x"))
      .groupBy(col("x.lvl").as("lvl"), col("x.qi").as("qi"))
      .agg(count(lit(1)).as("n"))
      .groupBy("lvl")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < KAnon, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("n") < KAnon, col("n")).otherwise(0L)).as("rows_at_risk"),
        sum("n").as("n_rows"))
    val minOk = lvls.filter(col("rows_at_risk") === 0)
      .agg(min("lvl").as("min_ok"))
    lvls.crossJoin(broadcast(minOk)) // 1-row minimal rung rides every row
      .select(col("lvl"), col("n_classes"), col("n_violating"),
        col("rows_at_risk"), col("n_rows"),
        (col("rows_at_risk") === 0).as("meets_k"),
        (col("lvl") === col("min_ok")).as("chosen"))
      .orderBy("lvl")
  }

  private[ops] val LDiv = 3L // the l in l-diversity

  /** q270: l-diversity audit — the HOMOGENEITY-ATTACK check k-anonymity
    * (q237) structurally cannot make: a class can hide k members and
    * still leak the SENSITIVE attribute outright if all k share it (an
    * adversary who links a victim to the class learns the value without
    * identifying the row). Here the sensitive attribute is the market
    * segment and the quasi-identifier is (nation, $1000 balance band) —
    * q237's QI WITH the sensitive column removed, which is the whole
    * point: diversity is measured across, never inside, the QI. A class
    * is diverse when it carries ≥ [[LDiv]] distinct segments; the audit
    * reports per nation the class count, diverse count, rows exposed by
    * non-diverse classes, and the worst (minimum) l.
    *
    * Scale shape: exactly q237's — groupBy(QI) with a count and an
    * exact countDistinct over a 5-value attribute (partial aggregation
    * carries a ≤5-element set per class, never a shuffle of raw rows
    * per distinct), then a nation-count-sized rollup. No window, no
    * driver materialization. */
  def q270LDiversity(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .select(col("c_nationkey"),
        expr(s"(cast(round(c_acctbal * 100) as bigint) + 1000000) div $BandC2")
          .as("bal_band"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "bal_band")
      .agg(count(lit(1)).as("n"), countDistinct("c_mktsegment").as("l"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("l") >= LDiv, 1L).otherwise(0L)).as("n_diverse"),
        sum(when(col("l") < LDiv, col("n")).otherwise(0L)).as("rows_exposed"),
        min("l").as("min_l"),
        sum("n").as("n_rows"))
      .orderBy("c_nationkey")

  /** q307's breach rule: a class breaches when its t exceeds
    * [[TCloseNum]]/[[TCloseDen]] × the corpus's median class t
    * (3/2 — probed to fire AND pass at every tested SF). Derived, not
    * fixed (the q256 derived-k discipline): sampling noise moves the t
    * scale an order of magnitude across SFs (measured medians
    * 2986 → 289 bp from sf0.001 to sf0.1), so a fixed policy t is
    * vacuously all-breach at one SF and never-breach at another; a
    * deployment pins its policy t as a constant instead. The floored
    * `thr = (3·med) div 2` comparison equals the exact cross-multiplied
    * `2t > 3·med` (2t is even, so the odd-3m boundary cannot tie). */
  private[ops] val TCloseNum = 3L
  private[ops] val TCloseDen = 2L

  /** q307: t-closeness — the third leg of the privacy triad (q237
    * k-anonymity: classes big enough; q270 l-diversity: sensitive
    * values varied enough; t-closeness: the class's sensitive
    * DISTRIBUTION close enough to the global one that membership
    * reveals nothing — the skewness attack l-diversity misses).
    * Sensitive attribute = the ordered balance band (q237's grid,
    * shared [[BandC2]]); QI class = (nation, segment); distance = the
    * ordered-attribute Earth Mover's Distance, which for unit ground
    * distance is the mean absolute CDF gap:
    * `t = Σ_b |F_class(b) − F_global(b)| / (B−1)` — evaluated exactly
    * as cross-multiplied integers `Σ|cc·N − cg·n|` over
    * decimal(38,0), one floor at the final bp division.
    *
    * The global cumulative needs NO global window: with the dense
    * class×band grid, `cg(b) = Σ_classes cc(b)` — a plain band-keyed
    * aggregate of the per-class cumulatives. Per-class windows run
    * over ≤ band-count rows (policy-bounded, the q202 calendar
    * argument). Scale: one customer-sized cell aggregate; everything
    * after is classes × bands. TClosenessSpec pins the textbook EMD
    * walk and both verdicts. */
  def q307TCloseness(s: SparkSession, dir: String): DataFrame = {
    val cell = T(s, dir, "customer")
      .select(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        expr(s"(cast(round(c_acctbal * 100) as bigint) + 1000000) div $BandC2")
          .as("band"))
      .groupBy("nat", "seg", "band").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // classes, band bounds, and the grid all branch off it
    val cls = cell.groupBy("nat", "seg").agg(sum("cnt").as("n"))
    val bounds = cell.agg(min("band").as("b0"), max("band").as("b1"),
      sum("cnt").as("nn"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("nat", "seg").orderBy("band")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = cls.crossJoin(broadcast(bounds)) // 1-row band bounds + N
      .select(col("nat"), col("seg"), col("n"), col("nn"),
        explode(expr("sequence(b0, b1)")).as("band"))
      .join(cell, Seq("nat", "seg", "band"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("cc", sum("cnt").over(wc))
    val g = cum.groupBy("band").agg(sum("cc").as("cg"))
    val t = cum.join(broadcast(g), "band")
      .withColumn("d", expr(
        "abs(cast(cc as decimal(38,0)) * nn - cast(cg as decimal(38,0)) * n)"))
      .groupBy("nat", "seg")
      .agg(max("n").as("n"), max("nn").as("nn"),
        count(lit(1)).as("nb"), sum("d").as("num"))
      .withColumn("t_bp", expr(
        "cast((num * 10000) div (cast(n as decimal(38,0)) * nn" +
          " * greatest(nb - 1, 1)) as bigint)"))
      .select("nat", "seg", "n", "t_bp")
    val ranked = ScalableRank.withGlobalRowNumber(t, "rn",
      col("t_bp"), col("nat"), col("seg"))
    val med = ranked.agg(count(lit(1)).as("ncls")).collect()(0).getLong(0)
    val medRow = ranked.filter(col("rn") === (med + 1) / 2)
      .select(col("t_bp").as("med"))
    ranked.crossJoin(broadcast(medRow)) // 1-row derived median (q127 class)
      .withColumn("thr_bp",
        expr(s"($TCloseNum * med) div $TCloseDen"))
      .withColumn("breach", col("t_bp") > col("thr_bp"))
      .select("nat", "seg", "n", "t_bp", "thr_bp", "breach")
      .orderBy("nat", "seg")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q307_t_closeness" -> q307TCloseness _,
    "q216_cascade_delete" -> q216CascadeDelete _,
    "q237_k_anonymity" -> q237KAnonymity _,
    "q253_generalize_ladder" -> q253GeneralizeLadder _,
    "q270_l_diversity" -> q270LDiversity _,
  )

  val oracle: Map[String, String] = Map(
    // q307: identical band grid, dense class×band cumulatives, the
    // cross-multiplied EMD, and the same derived 2×median threshold
    "q307_t_closeness" ->
      s"""WITH cell AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
        |         (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // $BandC2 AS band,
        |         count(*) AS cnt
        |       FROM customer GROUP BY 1, 2, 3),
        |cls AS (SELECT nat, seg, sum(cnt) AS n FROM cell GROUP BY 1, 2),
        |bounds AS (SELECT min(band) AS b0, max(band) AS b1,
        |             CAST(sum(cnt) AS HUGEINT) AS nn FROM cell),
        |grid AS (SELECT c.nat, c.seg, c.n, bo.nn, r.band,
        |           coalesce(cell.cnt, 0) AS cnt
        |         FROM cls c CROSS JOIN bounds bo
        |         CROSS JOIN (SELECT unnest(generate_series(
        |             (SELECT b0 FROM bounds), (SELECT b1 FROM bounds))) AS band) r
        |         LEFT JOIN cell ON cell.nat = c.nat AND cell.seg = c.seg
        |                        AND cell.band = r.band),
        |cum AS (SELECT *, sum(cnt) OVER (PARTITION BY nat, seg
        |          ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) AS cc FROM grid),
        |g AS (SELECT band, CAST(sum(cc) AS HUGEINT) AS cg FROM cum GROUP BY 1),
        |t AS (SELECT cum.nat, cum.seg, max(cum.n) AS n, max(cum.nn) AS nn,
        |        count(*) AS nb,
        |        sum(abs(CAST(cum.cc AS HUGEINT) * cum.nn
        |                - g.cg * cum.n)) AS num
        |      FROM cum JOIN g USING (band) GROUP BY 1, 2),
        |tb AS (SELECT nat, seg, CAST(n AS BIGINT) AS n,
        |         CAST((num * 10000) // (CAST(n AS HUGEINT) * nn
        |              * greatest(nb - 1, 1)) AS BIGINT) AS t_bp
        |       FROM t),
        |rk AS (SELECT *, row_number() OVER (ORDER BY t_bp, nat, seg) AS rn,
        |         count(*) OVER () AS ncls FROM tb),
        |med AS (SELECT t_bp AS m FROM rk WHERE rn = (ncls + 1) // 2)
        |SELECT nat, seg, n, t_bp,
        |       CAST(($TCloseNum * med.m) // $TCloseDen AS BIGINT) AS thr_bp,
        |       t_bp > ($TCloseNum * med.m) // $TCloseDen AS breach
        |FROM tb, med ORDER BY nat, seg""".stripMargin,
    // q216: the same md5-ticket cohort and FK propagation; counts are
    // plain integer aggregates in both engines
    "q216_cascade_delete" ->
      """WITH del AS (
        |  SELECT c_custkey AS k FROM customer
        |  WHERE ('0x' || substr(md5('del:' || c_custkey::VARCHAR), 1, 12))::BIGINT % 16 = 0),
        |odel AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT k FROM del)),
        |rows AS (
        |  SELECT 'customer' AS tbl, count(*) AS n_rows,
        |    sum(CASE WHEN c_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS n_deleted
        |  FROM customer
        |  UNION ALL SELECT 'orders', count(*),
        |    sum(CASE WHEN o_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END)
        |  FROM orders
        |  UNION ALL SELECT 'lineitem', count(*),
        |    sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM odel) THEN 1 ELSE 0 END)
        |  FROM lineitem
        |  UNION ALL SELECT 'events', count(*),
        |    sum(CASE WHEN user_id IN (SELECT k FROM del) THEN 1 ELSE 0 END)
        |  FROM events)
        |SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_deleted AS BIGINT) AS n_deleted,
        |       CAST(n_rows - n_deleted AS BIGINT) AS n_kept
        |FROM rows ORDER BY tbl""".stripMargin,
    // q253: the identical 5-rung ladder (same widths Seq, same
    // offset-positive cents, same '|'-joined class keys) — the minimal
    // satisfying rung re-derived by the same min-over-satisfying scalar
    "q253_generalize_ladder" -> {
      val b = LadderBandsC2
      s"""WITH c AS (SELECT c_mktsegment AS seg, c_nationkey AS nk, n_regionkey AS rk,
        |            CAST(round(c_acctbal * 100) AS BIGINT) + 1000000 AS balp
        |           FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |q AS (
        |  SELECT 0 AS lvl, nk::VARCHAR || '|' || seg || '|' || (balp // ${b(0)})::VARCHAR AS qi FROM c
        |  UNION ALL SELECT 1, nk::VARCHAR || '|' || seg || '|' || (balp // ${b(1)})::VARCHAR FROM c
        |  UNION ALL SELECT 2, rk::VARCHAR || '|' || seg || '|' || (balp // ${b(2)})::VARCHAR FROM c
        |  UNION ALL SELECT 3, rk::VARCHAR || '|' || (balp // ${b(3)})::VARCHAR FROM c
        |  UNION ALL SELECT 4, '*' FROM c),
        |cls AS (SELECT lvl, qi, count(*) AS n FROM q GROUP BY 1, 2),
        |l AS (SELECT lvl, count(*) AS n_classes,
        |        sum(CASE WHEN n < $KAnon THEN 1 ELSE 0 END) AS n_violating,
        |        sum(CASE WHEN n < $KAnon THEN n ELSE 0 END) AS rows_at_risk,
        |        sum(n) AS n_rows
        |      FROM cls GROUP BY 1),
        |mo AS (SELECT min(lvl) AS min_ok FROM l WHERE rows_at_risk = 0)
        |SELECT CAST(lvl AS INTEGER) AS lvl, CAST(n_classes AS BIGINT) AS n_classes,
        |       CAST(n_violating AS BIGINT) AS n_violating,
        |       CAST(rows_at_risk AS BIGINT) AS rows_at_risk,
        |       CAST(n_rows AS BIGINT) AS n_rows,
        |       rows_at_risk = 0 AS meets_k,
        |       lvl = mo.min_ok AS chosen
        |FROM l, mo ORDER BY lvl""".stripMargin
    },
    // q237: identical QI tuple (offset-positive band division) and the
    // same two-level rollup; all counts are plain integer aggregates
    "q237_k_anonymity" ->
      s"""WITH cls AS (
        |  SELECT c_mktsegment, c_nationkey,
        |         (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // $BandC2 AS bal_band,
        |         count(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_classes,
        |       CAST(sum(CASE WHEN n < $KAnon THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |       CAST(sum(CASE WHEN n < $KAnon THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |       CAST(sum(n) AS BIGINT) AS n_rows
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
    // q270: the same QI-minus-sensitive classes; count(DISTINCT seg) is
    // exact in both engines over the 5-value segment domain
    "q270_l_diversity" ->
      s"""WITH cls AS (
        |  SELECT c_nationkey,
        |         (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // $BandC2 AS bal_band,
        |         count(*) AS n, count(DISTINCT c_mktsegment) AS l
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_classes,
        |       CAST(sum(CASE WHEN l >= $LDiv THEN 1 ELSE 0 END) AS BIGINT) AS n_diverse,
        |       CAST(sum(CASE WHEN l < $LDiv THEN n ELSE 0 END) AS BIGINT) AS rows_exposed,
        |       CAST(min(l) AS BIGINT) AS min_l,
        |       CAST(sum(n) AS BIGINT) AS n_rows
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
