package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes expressible on the slimmed testdata
  * schema (SURVEY.md §2.3 q134–q147) — with these, every one of the 22
  * TPC-H query STRUCTURES has a tested equivalent in the suite started by
  * q30/q121/q122/q124–q128. Five shapes are faithful (Q6/Q7/Q10/Q14/Q15);
  * the ones whose canonical predicates need absent columns
  * (l_commitdate/l_receiptdate/l_shipmode/p_container, partsupp) are
  * shape-preserving adaptations: the join/subquery/aggregate STRUCTURE —
  * the thing the optimizer has to get right — is the original's, with the
  * missing column's predicate replaced by an equivalent one on present
  * columns (late = shipped >90 days after order date, delay classes for
  * ship modes, brand/size DNF for brand/container). The five partsupp
  * shapes (Q2/Q9/Q11/Q16/Q20 → q143–q147) derive the supplier-part
  * catalog from lineitem itself: `distinct (l_partkey, l_suppkey)` is the
  * relationship set, per-pair lineitem aggregates stand in for
  * ps_supplycost (min observed price) and ps_availqty (shipped-quantity
  * balance) — one partial-aggregatable shuffle each, exactly the plan the
  * real partsupp join would have.
  *
  * Shared disciplines (same as [[Relational]]):
  *  - money is exact integer arithmetic: 2-decimal prices/discounts by
  *    generator contract → `round(x*100)` bigint cents, sums exact and
  *    order-independent cross-engine ([[Relational.revenueC4]]);
  *  - every multi-row output ends in an ORDER BY making row order unique;
  *  - constant dims (nation/region/supplier at these SFs) broadcast
  *    explicitly, fact-fact joins stay shuffle equi-joins for AQE;
  *  - correlated EXISTS/NOT-EXISTS re-express as left-semi/left-anti
  *    joins (never a per-row re-executed subquery).
  */
object TpchShapes {

  import Relational.revenueC4

  /** q134: TPC-H Q4 shape (order priority checking) — EXISTS as a
    * left-semi join with a non-equi residual: orders in a 3-month window
    * having at least one lineitem shipped >90 days after the order date
    * (the late-commit predicate adapted to the present columns), counted
    * per priority. The semi join hashes on the orderkey equi-condition
    * and evaluates the date residual inside the join — no distinct, no
    * double-counting risk, and the 3-month filter pushes into the orders
    * scan before the shuffle. */
  def q134OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders")
      .filter(col("o_orderdate") >= expr("timestamp'1996-07-01'") &&
        col("o_orderdate") < expr("timestamp'1996-10-01'"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = T(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("interval 90 days"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** q135: TPC-H Q6 shape (forecast revenue change) — the pure
    * scan-filter-aggregate: one year of shipments in a discount band
    * under a quantity cap, summed to a single row. Every predicate is a
    * plain column compare, so all three reach the parquet scan as
    * `PushedFilters` (row groups outside the shipdate year never
    * decompress); the aggregate is the degenerate partial+final with a
    * 1-row exchange. Revenue here is price×discount (what WOULD have
    * been earned), exact in c4 integer units. */
  def q135RevenueForecast(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1997-01-01'") &&
        col("l_shipdate") < expr("timestamp'1998-01-01'") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint) * " +
        "cast(round(l_discount * 100) as bigint)")).as("revenue_c4"),
        count(lit(1)).as("n_items"))

  /** q136: TPC-H Q7 shape (volume shipping) — the bidirectional
    * nation-pair join: revenue flowing between NATION_1 and NATION_2 in
    * either direction, by supplier nation × customer nation × ship year.
    * Both nation lookups broadcast (25 rows, constant at any SF); the
    * direction predicate is a symmetric OR over the two broadcast-joined
    * name columns, evaluated after the equi-joins so every join stays a
    * hash/sort-merge equi-join. The year() projection happens before the
    * aggregate, so the shuffle carries (nation, nation, year) cells.
    *
    * Join ORDER (r13, the r12 verdict's one plan-order finding): the
    * 2-of-25-nation broadcast supplier filter joins the lineitem scan
    * FIRST — it keeps only ~2/25 ≈ 8% of fact rows, so the dominant
    * lineitem⋈orders shuffle exchanges an eighth of the two-year slice
    * instead of all of it. Catalyst does not reorder a selective
    * broadcast join ahead of a fact-fact join on its own (no NDV stats
    * on the name filter), so the DataFrame declares the order. At
    * 100 TB this is the difference between shuffling the full slice
    * and ~12× less. */
  def q136NationVolume(s: SparkSession, dir: String): DataFrame = {
    val names = Seq("NATION_1", "NATION_2")
    val n = T(s, dir, "nation").filter(col("n_name").isin(names: _*))
    val sup = T(s, dir, "supplier")
      .join(broadcast(n.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    val cust = T(s, dir, "customer")
      .join(broadcast(n.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .select("c_custkey", "cust_nation")
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1996-01-01'") &&
        col("l_shipdate") < expr("timestamp'1998-01-01'"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(T(s, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_1"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(revenueC4).as("revenue_c4"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q137: TPC-H Q10 shape (returned item reporting) — quarter of
    * orders × returned lineitems (`l_returnflag = 'R'`), revenue per
    * customer, top 20: both selective filters push into their scans
    * BEFORE the fact-fact join, nation broadcasts onto the aggregated
    * row (not the fact stream), and the top-20 plans as
    * `TakeOrderedAndProject` with the custkey tiebreak making the cut
    * deterministic (exact integer revenue — no float-ordering ties). */
  def q137ReturnedTopCustomers(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders")
      .filter(col("o_orderdate") >= expr("timestamp'1996-10-01'") &&
        col("o_orderdate") < expr("timestamp'1997-01-01'"))
      .select("o_orderkey", "o_custkey")
    val l = T(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val c = T(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("acctbal_c2"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(s, dir, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name", "acctbal_c2")
      .agg(sum(revenueC4).as("revenue_c4"))
      .orderBy(col("revenue_c4").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue_c4", "acctbal_c2", "n_name")
  }

  /** q138: TPC-H Q12 shape (shipping delay vs priority) — the
    * CASE-sum-over-join: l_shipmode classes adapted (column absent) to
    * shipping-delay classes on present columns, counting critical
    * (1-URGENT/2-HIGH) vs other orders per class. The conditional counts
    * are `sum(CASE …)` inside ONE aggregate pass — never one scan per
    * class — and the year filter pushes into the lineitem scan side of
    * the join. All-integer output. */
  def q138DelayClass(s: SparkSession, dir: String): DataFrame = {
    val l = T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1997-01-01'") &&
        col("l_shipdate") < expr("timestamp'1998-01-01'"))
      .select("l_orderkey", "l_shipdate")
    val o = T(s, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_d", datediff(col("l_shipdate"), col("o_orderdate")))
      .withColumn("delay_class",
        when(col("delay_d") <= 30, "on_time")
          .when(col("delay_d") <= 90, "late")
          .otherwise("very_late"))
      .groupBy("delay_class")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("delay_class")
  }

  /** q139: TPC-H Q14 shape (promotion effect) — the
    * conditional-share aggregate: PROMO-typed parts' fraction of one
    * month's revenue. Both the conditional numerator and the total come
    * out of the SAME single aggregate pass (`sum(CASE)` + `sum`), the
    * part join is a plain equi-join AQE may broadcast, and the share is
    * one double division of exact c4 integers rounded to 4 — identical
    * cross-engine. */
  def q139PromoShare(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1997-09-01'") &&
        col("l_shipdate") < expr("timestamp'1997-10-01'"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(T(s, dir, "part").select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenueC4).otherwise(0L))
          .as("promo_c4"),
        sum(revenueC4).as("total_c4"))
      .select(col("promo_c4"), col("total_c4"),
        round(lit(100.0) * col("promo_c4") / col("total_c4"), 4)
          .as("promo_share_pct"))

  /** q140: TPC-H Q15 shape (top supplier) — max-equality over an
    * aggregate: per-supplier quarterly revenue, keep the supplier(s)
    * hitting the global max. The max is a 1-row aggregate of the ALREADY
    * aggregated (|suppliers|-row) table broadcast back — the named
    * bounded crossJoin exception (q127's shape), never a global window
    * over the fact table. Equality on exact c4 integers makes the
    * all-ties semantics deterministic cross-engine (the double-revenue
    * formulation could disagree on the last ulp and drop a tie). */
  def q140TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1997-01-01'") &&
        col("l_shipdate") < expr("timestamp'1997-04-01'"))
      .groupBy("l_suppkey")
      .agg(sum(revenueC4).as("total_rev_c4"))
    val mx = rev.agg(max(col("total_rev_c4")).as("max_rev_c4"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev_c4") === col("max_rev_c4"))
      .join(broadcast(T(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_rev_c4")
      .orderBy("s_suppkey")
  }

  /** q141: TPC-H Q19 shape (discounted revenue, DNF predicate) — the
    * OR-of-ANDs join filter (brand/container/quantity adapted to
    * brand/size/quantity): three conjunct groups mixing part-side and
    * lineitem-side columns. Catalyst's convertible-filter extraction
    * derives each side's DNF hull — the part-only
    * `(brand∧size)∨(brand∧size)∨(brand∧size)` pushes into the part scan,
    * the quantity hull into lineitem — so the join sees pre-filtered
    * inputs and only the residual cross-side DNF evaluates post-join
    * (TpchMoreSpec pins the part-side pushdown). */
  def q141BrandSizeRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = T(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val p = T(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(16, 30) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(31, 50) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(revenueC4).as("revenue_c4"), count(lit(1)).as("n_items"))
  }

  /** q142: TPC-H Q21 shape (suppliers who kept orders waiting) — the
    * EXISTS + NOT-EXISTS composite: late (shipped >90 days after order,
    * the adapted late predicate) suppliers on finished multi-supplier
    * orders where NO other supplier was also late — i.e. the single
    * culprit. Built from one deduplicated (order, supplier) late set and
    * one all-pairs set, both reused for the semi (another supplier
    * exists) and anti (no other LATE supplier) joins — each a hash
    * equi-join on orderkey with the `suppkey ≠` residual, never a
    * correlated re-execution. The nation filter lands on the probe side
    * FIRST, so the expensive semi/anti joins run on the 1/25th slice. */
  def q142WaitingSuppliers(s: SparkSession, dir: String): DataFrame =
    waitingSuppliers(s, dir, "NATION_7")

  /** [[q142WaitingSuppliers]] with the nation as a parameter — the spec
    * drives a nation that has culprits at sf0.001 (NATION_7's slice is
    * empty at the smallest SF, which would make the assertion vacuous). */
  private[ops] def waitingSuppliers(s: SparkSession, dir: String,
                                    nation: String): DataFrame = {
    val o = T(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = T(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("interval 90 days"))
      .select("l_orderkey", "l_suppkey").distinct()
    val pairs = l.select(col("l_orderkey").as("p_okey"),
      col("l_suppkey").as("p_skey")).distinct()
    val natSupp = T(s, dir, "supplier")
      .join(broadcast(T(s, dir, "nation")
        .filter(col("n_name") === nation).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    val lateOther = late.select(col("l_orderkey").as("y_okey"),
      col("l_suppkey").as("y_skey"))
    late.join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .join(pairs, col("p_okey") === col("l_orderkey") &&
        col("p_skey") =!= col("l_suppkey"), "left_semi")
      .join(lateOther, col("y_okey") === col("l_orderkey") &&
        col("y_skey") =!= col("l_suppkey"), "left_anti")
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  // ---- q143–q147: the partsupp shapes (TPC-H Q2/Q9/Q11/Q16/Q20) -------

  /** The derived supplier-part catalog standing in for the absent
    * partsupp table (header contract): `distinct (l_partkey,
    * l_suppkey)` is the relationship set; `ps_supplycost_c2` = min
    * observed line price in exact cents; `ps_availqty` = total shipped
    * quantity (integral by generator contract). ONE partial-aggregatable
    * shuffle on the pair key — exactly the plan a real partsupp join
    * would have — and every downstream join on (partkey, suppkey) reuses
    * that partitioning. */
  private def derivedPartsupp(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("ps_supplycost_c2"),
        sum(expr("cast(round(l_quantity) as bigint)")).as("ps_availqty"))

  /** q143: TPC-H Q2 shape (minimum cost supplier) — the correlated-min
    * subquery, decorrelated: for STANDARD-type large parts, the
    * EUROPE-region supplier(s) offering each part at its regional
    * minimum cost. The per-part min is a separate aggregate of the
    * ALREADY region-filtered candidate set joined back on (partkey,
    * min-cost equality) — never a per-row re-executed subquery — and
    * the region→nation→supplier dimension chain broadcasts (dims are
    * thousands of rows at any SF; the pair catalog is the only fact).
    * Cost equality on exact c2 integers keeps the all-ties semantics
    * deterministic cross-engine. */
  def q143MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val nat = T(s, dir, "nation")
      .join(broadcast(T(s, dir, "region").filter(col("r_name") === "EUROPE")
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = T(s, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        expr("cast(round(s_acctbal * 100) as bigint)").as("acctbal_c2"))
    val p = T(s, dir, "part")
      .filter(col("p_type") === "STANDARD" && col("p_size") >= 25)
      .select("p_partkey")
    val cand = derivedPartsupp(s, dir)
      .join(p, col("ps_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
    val minCost = cand.groupBy(col("ps_partkey").as("mc_partkey"))
      .agg(min("ps_supplycost_c2").as("min_cost_c2"))
    cand.join(minCost, col("ps_partkey") === col("mc_partkey") &&
        col("ps_supplycost_c2") === col("min_cost_c2"))
      .select(col("acctbal_c2"), col("s_name"), col("n_name"),
        col("ps_partkey"), col("ps_supplycost_c2"))
      .orderBy(col("acctbal_c2").desc, col("n_name"), col("s_name"),
        col("ps_partkey"))
      .limit(100)
  }

  /** q144: TPC-H Q9 shape (product type profit measure) — the
    * five-table star with a derived-cost term: per supplier nation ×
    * order year, profit = revenue − supplycost×qty over bolt-named
    * parts. The part filter pushes before the pair-key join; lineitem
    * joins the pair catalog on (partkey, suppkey) — a shuffle join that
    * AQE can co-locate with the catalog's own aggregation partitioning —
    * while supplier/nation broadcast and orders joins on orderkey.
    * Profit stays in exact c4 integers: cents(price)·(100−cents(disc))
    * − cost_c2·qty·100. */
  def q144NationProfit(s: SparkSession, dir: String): DataFrame = {
    val p = T(s, dir, "part").filter(col("p_name").like("%bolt%"))
      .select("p_partkey")
    val sup = T(s, dir, "supplier")
      .join(broadcast(T(s, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    T(s, dir, "lineitem")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(derivedPartsupp(s, dir),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(T(s, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revenueC4 -
        col("ps_supplycost_c2") * expr("cast(round(l_quantity) as bigint)") *
          lit(100L)).as("profit_c4"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** q145: TPC-H Q11 shape (important stock identification) — aggregate
    * + scalar-subquery threshold + HAVING: per-part catalog value
    * (cost×availqty) over one nation's suppliers, keeping parts worth
    * more than 2× the average part value. The threshold normalizes by
    * the part count instead of Q11's SF-pinned constant fraction, so
    * the predicate is scale-free (the driver verifies at a different SF
    * than the spec runs); the 1-row total/count aggregate rides a
    * broadcast crossJoin back onto the |parts|-bounded aggregate — the
    * named bounded exception, never a window. The compare is exact
    * integer cross-multiplication: value·n_parts > 2·total. */
  def q145ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val natSupp = T(s, dir, "supplier")
      .join(broadcast(T(s, dir, "nation").filter(col("n_name") === "NATION_15")
        .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = derivedPartsupp(s, dir)
      .join(broadcast(natSupp), col("ps_suppkey") === col("s_suppkey"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_supplycost_c2") * col("ps_availqty")).as("value_c2"))
    val tot = perPart.agg(sum("value_c2").as("total_c2"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(tot))
      .filter(col("value_c2") * col("n_parts") > lit(2L) * col("total_c2"))
      .select("ps_partkey", "value_c2")
      .orderBy(col("value_c2").desc, col("ps_partkey"))
  }

  /** q146: TPC-H Q16 shape (parts/supplier relationship) — NOT-IN
    * exclusion + distinct-count rollup: how many distinct suppliers
    * offer each surviving (brand, type, size) combination, excluding
    * one brand, the PROMO type tier, and (the complaint-supplier
    * exclusion adapted to present columns) every NATION_3 supplier.
    * The exclusion is a broadcast left-anti join — never a per-row
    * NOT IN re-execution — and the distinct count shuffles once on the
    * (brand, type, size) grouping after the pair catalog's partial
    * dedup. */
  def q146SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val excl = T(s, dir, "supplier")
      .join(broadcast(T(s, dir, "nation").filter(col("n_name") === "NATION_3")
        .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("x_suppkey"))
    val p = T(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    derivedPartsupp(s, dir)
      .join(p, col("ps_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("ps_suppkey") === col("x_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** q147: TPC-H Q20 shape (potential part promotion) — the
    * doubly-nested subquery collapsed to aggregates + a semi join:
    * NATION_18 suppliers with at least one widget-part pair whose 1997
    * shipments exceed half its all-time quantity (Q20's
    * availqty-vs-half-year-demand compare re-anchored so the derived
    * availqty — which by construction bounds any year's shipments —
    * yields a non-vacuous predicate). Both quantity aggregates share
    * the (partkey, suppkey) shuffle key; the final supplier filter is a
    * broadcast semi join carrying only distinct culprit suppkeys. The
    * compare is exact: 2·qty_1997 > availqty in bigint. */
  def q147PromotionSuppliers(s: SparkSession, dir: String): DataFrame = {
    val p = T(s, dir, "part").filter(col("p_name").like("%widget%"))
      .select("p_partkey")
    val qty97 = T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= expr("timestamp'1997-01-01'") &&
        col("l_shipdate") < expr("timestamp'1998-01-01'"))
      .groupBy(col("l_partkey").as("y_partkey"),
        col("l_suppkey").as("y_suppkey"))
      .agg(sum(expr("cast(round(l_quantity) as bigint)")).as("qty_1997"))
    val culprits = derivedPartsupp(s, dir)
      .join(p, col("ps_partkey") === col("p_partkey"))
      .join(qty97, col("ps_partkey") === col("y_partkey") &&
        col("ps_suppkey") === col("y_suppkey"))
      .filter(lit(2L) * col("qty_1997") > col("ps_availqty"))
      .select("ps_suppkey")
    T(s, dir, "supplier")
      .join(broadcast(T(s, dir, "nation").filter(col("n_name") === "NATION_18")
        .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"))
      .join(culprits, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_name")
  }

  /** q276 pivot year: orders at or after it are the "after" period —
    * a fixed campaign date (the generator's year range is fixed, so the
    * literal is scale-invariant; production passes its launch date). */
  private[ops] val UpliftPivotYear = 1998

  /** q276: promotion uplift as difference-in-differences — the
    * campaign-measurement report: did PROMO parts' average line value
    * move differently across the campaign date than everything else's?
    * The 2×2 design (treated = PROMO parts / control = all others ×
    * before / after [[UpliftPivotYear]]) controls for the market-wide
    * trend a naive before/after comparison conflates with the
    * campaign: uplift = (T_after/T_before) ÷ (C_after/C_before), in
    * basis points on the integer-cents average grid (per-cell integer
    * avg first, so every product stays < 2⁶² — the q264 domain-bound
    * discipline).
    *
    * Scale shape: one lineitem⋈orders equi-join (the date lookup), one
    * broadcast part join (the treatment flag), ONE partial+final
    * 4-group aggregate, then the 4-row frame pivots to the one-row
    * report by conditional aggregation — no window, no self-join; the
    * report costs a 100 TB fact exactly one pass. */
  def q276PromoUplift(s: SparkSession, dir: String): DataFrame = {
    val cells = T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c2"))
      .join(T(s, dir, "orders")
        .select(col("o_orderkey"), expr("year(o_orderdate)").as("yr")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T(s, dir, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("treated", col("p_type") === "PROMO")
      .withColumn("after", col("yr") >= UpliftPivotYear)
      .groupBy("treated", "after")
      .agg(count(lit(1)).as("n"), sum("c2").as("rev"))
      .withColumn("avg_c2", expr("rev div n"))
    def cell(t: Boolean, a: Boolean, c: String) =
      max(when(col("treated") === t && col("after") === a, col(c)))
    cells.agg(
        cell(t = true, a = false, "n").as("n_tb"),
        cell(t = true, a = true, "n").as("n_ta"),
        cell(t = false, a = false, "n").as("n_cb"),
        cell(t = false, a = true, "n").as("n_ca"),
        cell(t = true, a = false, "avg_c2").as("tb_avg_c2"),
        cell(t = true, a = true, "avg_c2").as("ta_avg_c2"),
        cell(t = false, a = false, "avg_c2").as("cb_avg_c2"),
        cell(t = false, a = true, "avg_c2").as("ca_avg_c2"))
      .withColumn("treated_bp", expr("(ta_avg_c2 * 10000) div tb_avg_c2"))
      .withColumn("control_bp", expr("(ca_avg_c2 * 10000) div cb_avg_c2"))
      .withColumn("did_bp",
        expr("(ta_avg_c2 * cb_avg_c2 * 10000) div (tb_avg_c2 * ca_avg_c2)"))
  }

  /** q291: the discount ladder — the promotion-effectiveness readout
    * pricing teams eyeball before any elasticity model: per integer
    * discount band (round(l_discount·100), 0–10%), line count, total
    * quantity, average quantity ×100 (floored integers), revenue — and
    * the STEP vs the previous band (avg-quantity delta), computed by a
    * band-count-sized self-join shifted one band (11 rows; never a
    * window — even a tiny unpartitioned window is the single-task
    * shape PlanShapeSpec bans, and the ladder frame is join-sized
    * anyway). The first band's step is null (no predecessor). */
  def q291DiscountLadder(s: SparkSession, dir: String): DataFrame = {
    val bands = T(s, dir, "lineitem")
      .select(expr("cast(round(l_discount * 100) as bigint)").as("band"),
        expr("cast(l_quantity as bigint)").as("q"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c2"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_lines"), sum("q").as("sum_qty"),
        expr("(sum(q) * 100) div count(1)").as("avg_qty_x100"),
        sum("c2").as("rev_c2"))
    val prev = bands.select((col("band") + 1).as("band"),
      col("avg_qty_x100").as("prev_avg"))
    bands.join(prev, Seq("band"), "left")
      .withColumn("step_x100", col("avg_qty_x100") - col("prev_avg"))
      .select("band", "n_lines", "sum_qty", "avg_qty_x100", "rev_c2",
        "step_x100")
      .orderBy("band")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q291_discount_ladder" -> q291DiscountLadder _,
    "q276_promo_uplift" -> q276PromoUplift _,
    "q134_order_priority" -> q134OrderPriority _,
    "q135_revenue_forecast" -> q135RevenueForecast _,
    "q136_nation_volume" -> q136NationVolume _,
    "q137_returned_top_customers" -> q137ReturnedTopCustomers _,
    "q138_delay_class" -> q138DelayClass _,
    "q139_promo_share" -> q139PromoShare _,
    "q140_top_supplier" -> q140TopSupplier _,
    "q141_brand_size_revenue" -> q141BrandSizeRevenue _,
    "q142_waiting_suppliers" -> q142WaitingSuppliers _,
    "q143_min_cost_supplier" -> q143MinCostSupplier _,
    "q144_nation_profit" -> q144NationProfit _,
    "q145_important_stock" -> q145ImportantStock _,
    "q146_supplier_cnt" -> q146SupplierCnt _,
    "q147_promotion_suppliers" -> q147PromotionSuppliers _,
  )

  /** The shared derived-partsupp CTE every q143–q147 oracle opens with
    * (the SQL twin of [[derivedPartsupp]]). */
  private val PsdCte =
    """WITH psd AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |           AS ps_supplycost_c2,
      |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
      |           AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    // q291: identical bands, floored averages, and the shifted self-join
    "q291_discount_ladder" ->
      """WITH b AS (SELECT CAST(round(l_discount * 100) AS BIGINT) AS band,
        |             count(*) AS n_lines,
        |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |             CAST((sum(CAST(l_quantity AS BIGINT)) * 100) // count(*)
        |                  AS BIGINT) AS avg_qty_x100,
        |             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |                  AS BIGINT) AS rev_c2
        |           FROM lineitem GROUP BY 1)
        |SELECT a.band, a.n_lines, a.sum_qty, a.avg_qty_x100, a.rev_c2,
        |       CAST(a.avg_qty_x100 - p.avg_qty_x100 AS BIGINT) AS step_x100
        |FROM b a LEFT JOIN b p ON p.band = a.band - 1
        |ORDER BY a.band""".stripMargin,
    // q276: identical 2×2 cells, identical per-cell integer avg and
    // ratio arithmetic (avg first keeps every product in range)
    "q276_promo_uplift" ->
      s"""WITH j AS (SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT) AS c2,
        |             p.p_type = 'PROMO' AS treated,
        |             year(o.o_orderdate) >= $UpliftPivotYear AS a
        |           FROM lineitem l
        |           JOIN orders o ON l.l_orderkey = o.o_orderkey
        |           JOIN part p ON l.l_partkey = p.p_partkey),
        |cells AS (SELECT treated, a, count(*) AS n,
        |            sum(c2) // count(*) AS avg_c2
        |          FROM j GROUP BY 1, 2),
        |pv AS (SELECT
        |         max(CASE WHEN treated AND NOT a THEN n END) AS n_tb,
        |         max(CASE WHEN treated AND a THEN n END) AS n_ta,
        |         max(CASE WHEN NOT treated AND NOT a THEN n END) AS n_cb,
        |         max(CASE WHEN NOT treated AND a THEN n END) AS n_ca,
        |         max(CASE WHEN treated AND NOT a THEN avg_c2 END) AS tb_avg_c2,
        |         max(CASE WHEN treated AND a THEN avg_c2 END) AS ta_avg_c2,
        |         max(CASE WHEN NOT treated AND NOT a THEN avg_c2 END) AS cb_avg_c2,
        |         max(CASE WHEN NOT treated AND a THEN avg_c2 END) AS ca_avg_c2
        |       FROM cells)
        |SELECT CAST(n_tb AS BIGINT) AS n_tb, CAST(n_ta AS BIGINT) AS n_ta,
        |       CAST(n_cb AS BIGINT) AS n_cb, CAST(n_ca AS BIGINT) AS n_ca,
        |       CAST(tb_avg_c2 AS BIGINT) AS tb_avg_c2,
        |       CAST(ta_avg_c2 AS BIGINT) AS ta_avg_c2,
        |       CAST(cb_avg_c2 AS BIGINT) AS cb_avg_c2,
        |       CAST(ca_avg_c2 AS BIGINT) AS ca_avg_c2,
        |       CAST((ta_avg_c2 * 10000) // tb_avg_c2 AS BIGINT) AS treated_bp,
        |       CAST((ca_avg_c2 * 10000) // cb_avg_c2 AS BIGINT) AS control_bp,
        |       CAST((ta_avg_c2 * cb_avg_c2 * 10000)
        |            // (tb_avg_c2 * ca_avg_c2) AS BIGINT) AS did_bp
        |FROM pv""".stripMargin,
    "q134_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q135_revenue_forecast" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c4,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q136_nation_volume" ->
      """SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n2.n_name = 'NATION_1' AND n1.n_name = 'NATION_2') OR
        |       (n2.n_name = 'NATION_2' AND n1.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q137_returned_top_customers" ->
      """SELECT c.c_custkey, c.c_name,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4,
        |       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c2,
        |       n.n_name
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 4, 5
        |ORDER BY revenue_c4 DESC, c_custkey LIMIT 20""".stripMargin,
    "q138_delay_class" ->
      """SELECT CASE WHEN d <= 30 THEN 'on_time' WHEN d <= 90 THEN 'late'
        |            ELSE 'very_late' END AS delay_class,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM (SELECT date_diff('day', o.o_orderdate, l.l_shipdate) AS d,
        |             o.o_orderpriority
        |      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |        AND l.l_shipdate < TIMESTAMP '1998-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q139_promo_share" ->
      """WITH a AS (
        |  SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |                  THEN CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                       (100 - CAST(round(l.l_discount * 100) AS BIGINT))
        |                  ELSE 0 END) AS BIGINT) AS promo_c4,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                  (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS total_c4
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l.l_shipdate < TIMESTAMP '1997-10-01')
        |SELECT promo_c4, total_c4,
        |       round(100.0 * promo_c4 / total_c4, 4) AS promo_share_pct
        |FROM a""".stripMargin,
    "q140_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_rev_c4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, r.total_rev_c4
        |FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_rev_c4 = (SELECT max(total_rev_c4) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,
    "q141_brand_size_revenue" ->
      """SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c4,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 16 AND 30
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 31 AND 50
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q142_waiting_suppliers" ->
      """WITH late AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
        |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY),
        |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM late t
        |JOIN supplier s ON s.s_suppkey = t.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_7'
        |WHERE EXISTS (SELECT 1 FROM pairs p
        |              WHERE p.l_orderkey = t.l_orderkey
        |                AND p.l_suppkey <> t.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late y
        |                  WHERE y.l_orderkey = t.l_orderkey
        |                    AND y.l_suppkey <> t.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin,
    "q143_min_cost_supplier" -> (PsdCte +
      """,
        |cand AS (
        |  SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_c2,
        |         s.s_name, n.n_name, d.ps_partkey, d.ps_supplycost_c2
        |  FROM psd d
        |  JOIN part p ON p.p_partkey = d.ps_partkey
        |    AND p.p_type = 'STANDARD' AND p.p_size >= 25
        |  JOIN supplier s ON s.s_suppkey = d.ps_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |    AND r.r_name = 'EUROPE')
        |SELECT acctbal_c2, s_name, n_name, ps_partkey, ps_supplycost_c2
        |FROM cand c
        |WHERE c.ps_supplycost_c2 = (SELECT min(ps_supplycost_c2) FROM cand m
        |                            WHERE m.ps_partkey = c.ps_partkey)
        |ORDER BY acctbal_c2 DESC, n_name, s_name, ps_partkey
        |LIMIT 100""".stripMargin),
    "q144_nation_profit" -> (PsdCte +
      """
        |SELECT n.n_name,
        |       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l.l_discount * 100) AS BIGINT)) -
        |                d.ps_supplycost_c2 *
        |                CAST(round(l.l_quantity) AS BIGINT) * 100)
        |         AS BIGINT) AS profit_c4
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
        |JOIN psd d ON d.ps_partkey = l.l_partkey
        |          AND d.ps_suppkey = l.l_suppkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin),
    "q145_important_stock" -> (PsdCte +
      """,
        |per_part AS (
        |  SELECT d.ps_partkey,
        |         CAST(sum(d.ps_supplycost_c2 * d.ps_availqty) AS BIGINT)
        |           AS value_c2
        |  FROM psd d
        |  JOIN supplier s ON s.s_suppkey = d.ps_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |    AND n.n_name = 'NATION_15'
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(value_c2) AS BIGINT) AS total_c2,
        |               CAST(count(*) AS BIGINT) AS n_parts FROM per_part)
        |SELECT ps_partkey, value_c2
        |FROM per_part, tot
        |WHERE value_c2 * n_parts > 2 * total_c2
        |ORDER BY value_c2 DESC, ps_partkey""".stripMargin),
    "q146_supplier_cnt" -> (PsdCte +
      """
        |SELECT p.p_brand, p.p_type, p.p_size,
        |       CAST(count(DISTINCT d.ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM psd d
        |JOIN part p ON p.p_partkey = d.ps_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND d.ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier s
        |    JOIN nation n ON n.n_nationkey = s.s_nationkey
        |    WHERE n.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    "q147_promotion_suppliers" -> (PsdCte +
      """
        |SELECT s.s_suppkey, s.s_name
        |FROM supplier s
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  AND n.n_name = 'NATION_18'
        |WHERE s.s_suppkey IN (
        |  SELECT d.ps_suppkey
        |  FROM psd d
        |  JOIN part p ON p.p_partkey = d.ps_partkey
        |    AND p.p_name LIKE '%widget%'
        |  JOIN (SELECT l_partkey AS y_partkey, l_suppkey AS y_suppkey,
        |               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |                 AS qty_1997
        |        FROM lineitem
        |        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |          AND l_shipdate < TIMESTAMP '1998-01-01'
        |        GROUP BY 1, 2) y
        |    ON y.y_partkey = d.ps_partkey AND y.y_suppkey = d.ps_suppkey
        |  WHERE 2 * y.qty_1997 > d.ps_availqty)
        |ORDER BY s_name""".stripMargin),
  )
}
