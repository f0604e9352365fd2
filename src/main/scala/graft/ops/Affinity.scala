package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Item-affinity mining — the within-group pair-expansion shape
  * (market basket / co-occurrence): count, across all orders, how
  * often each unordered part pair appears in the SAME order. The
  * pattern is distinct from everything in the join family: the "join"
  * is a self-equi-join whose output is quadratic in BASKET size, not
  * in table size, so the scale discipline is about bounding the
  * per-group expansion, not the matching.
  */
object Affinity {

  /** q200: top-25 co-purchased part pairs. Baskets are deduplicated
    * first (an order listing a part twice is one co-occurrence), pairs
    * are canonicalized by `p1 < p2` inside the join condition (each
    * unordered pair generated exactly once, never both orientations),
    * and the result is the standard count + TakeOrdered top-k with a
    * full deterministic tie-break (n desc, p1, p2).
    *
    * Scale shape: ONE hash-partitioning of the deduped (order, part)
    * items on orderkey serves both sides of the self-join — Spark
    * reuses the exchange (ReusedExchange in the plan), so the
    * quadratic step is a partition-local stream-stream match with no
    * second shuffle. Output volume is Σ B(B−1)/2 over basket sizes B —
    * bounded here (TPC-H baskets ≤ 7 lines ⇒ ≤ 21 pairs/order) and
    * the thing to CAP at 100 TB: a degenerate mega-basket (B = 10⁶)
    * would alone emit 5·10¹¹ pairs, so production runs bound B first
    * (keep each basket's top-B items by global frequency — one
    * broadcast lookup + filter before the pair join); the pair
    * aggregate itself is a plain partial+final count on (p1, p2) and
    * the top-k never global-sorts. */
  def q200Copurchase(s: SparkSession, dir: String): DataFrame = {
    val items = T(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val right = items.select(col("ok").as("ok2"), col("pk").as("p2"))
    items.select(col("ok"), col("pk").as("p1"))
      .join(right, col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(25)
  }

  /** q215: association rules over the q200 co-occurrence counts — the
    * market-basket step AFTER pair mining: for every directed rule
    * `ante → cons` whose pair support clears the floor, report support,
    * confidence, and lift, with every THRESHOLD decided by integer
    * cross-multiplication (q191's discipline): a rule qualifies iff
    * `n_pair ≥ 3` and `10·n_pair ≥ n_ante` (confidence ≥ 10%), and the
    * reported ratios are floor-scaled basis points — no double ever
    * decides membership or ordering, so both engines agree bit-for-bit.
    *
    *  - conf_bp  = ⌊10⁴·n_pair / n_ante⌋
    *  - lift_bp  = ⌊10⁴·n_pair·N / (n_ante·n_cons)⌋ (N = basket count)
    *
    * Scale shape: item supports are ONE partial+final count on the
    * deduped items (item-vocabulary-sized result); the pair counts
    * reuse q200's exchange-reusing self-join; the two enrichment joins
    * key on a SINGLE item each (vocab-sized build side — broadcast here,
    * shuffle-join at extreme vocabularies) and the directed expansion is
    * an explode of exactly two orientations per surviving pair — output
    * is rule-count-sized, never basket-sized. The basket total N is the
    * one scalar driver value (a bounded count, q186's bounded-collect
    * class). Overflow headroom: the lift numerator n_pair·N·10⁴ stays
    * under 2⁶³ while n_pair·N < 9·10¹⁴ — beyond that (trillion-basket
    * corpora with ubiquitous pairs) route the one product through
    * DECIMAL(38,0); the comparisons themselves never need it. */
  def q215AssocRules(s: SparkSession, dir: String): DataFrame = {
    val items = T(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val nBaskets = items.select(countDistinct("ok")).head.getLong(0)
    val support = items.groupBy("pk").agg(count(lit(1)).as("n_item"))
    val right = items.select(col("ok").as("ok2"), col("pk").as("p2"))
    val pairs = items.select(col("ok"), col("pk").as("p1"))
      .join(right, col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 3)
    pairs
      .select(col("n_pair"), explode(array(
        struct(col("p1").as("ante"), col("p2").as("cons")),
        struct(col("p2").as("ante"), col("p1").as("cons")))).as("r"))
      .select(col("r.ante"), col("r.cons"), col("n_pair"))
      .join(broadcast(support.withColumnRenamed("pk", "ante")
        .withColumnRenamed("n_item", "n_ante")), "ante")
      .join(broadcast(support.withColumnRenamed("pk", "cons")
        .withColumnRenamed("n_item", "n_cons")), "cons")
      .filter(col("n_pair") * 10 >= col("n_ante"))
      .select(col("ante"), col("cons"), col("n_pair"),
        col("n_ante"), col("n_cons"),
        // integer floor division (`div`), NEVER `/` (double in Spark)
        expr("n_pair * 10000 div n_ante").as("conf_bp"),
        expr(s"n_pair * ${nBaskets}L * 10000 div (n_ante * n_cons)")
          .as("lift_bp"))
      .orderBy(col("lift_bp").desc, col("ante"), col("cons"))
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_copurchase" -> q200Copurchase _,
    "q215_assoc_rules" -> q215AssocRules _,
  )

  val oracle: Map[String, String] = Map(
    // q215: identical integer cross-multiplied thresholds and
    // floor-scaled basis points (// is DuckDB floor division, matching
    // Spark's div on positive operands)
    "q215_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |               FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS nb FROM items),
        |sup AS (SELECT pk, count(*) AS n_item FROM items GROUP BY 1),
        |p AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_pair
        |      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |d AS (SELECT p1 AS ante, p2 AS cons, n_pair FROM p
        |      UNION ALL SELECT p2, p1, n_pair FROM p),
        |e AS (SELECT d.ante, d.cons, d.n_pair,
        |             sa.n_item AS n_ante, sc.n_item AS n_cons, n.nb
        |      FROM d JOIN sup sa ON d.ante = sa.pk
        |             JOIN sup sc ON d.cons = sc.pk, n
        |      WHERE d.n_pair * 10 >= sa.n_item)
        |SELECT ante, cons, n_pair, n_ante, n_cons,
        |       n_pair * 10000 // n_ante AS conf_bp,
        |       n_pair * nb * 10000 // (n_ante * n_cons) AS lift_bp
        |FROM e ORDER BY lift_bp DESC, ante, cons LIMIT 50""".stripMargin,
    "q200_copurchase" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |               FROM lineitem)
        |SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_orders
        |FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, p1, p2
        |LIMIT 25""".stripMargin,
  )
}
