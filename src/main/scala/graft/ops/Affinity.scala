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
  *
  * [[basketItems]]/[[pairCounts]] (and their oracle CTEs
  * [[itemsCte]]/[[pairCte]]) are the ONE definition of the co-purchase
  * universe — q200, q215, and q218 (Graph) all read them, so the edge
  * definition can never drift between the pair report, the rules, and
  * the triangle counts.
  */
object Affinity {

  /** Deduped (order, part) basket items — an order listing a part
    * twice is one co-occurrence. */
  private[ops] def basketItems(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  /** Canonical unordered pair counts over the items: `p1 < p2` inside
    * the join condition (each pair generated exactly once, never both
    * orientations), partial+final count on (p1, p2). */
  private[ops] def pairCounts(items: DataFrame): DataFrame = {
    val right = items.select(col("ok").as("ok2"), col("pk").as("p2"))
    items.select(col("ok"), col("pk").as("p1"))
      .join(right, col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_pair"))
  }

  /** DuckDB twins of [[basketItems]]/[[pairCounts]], spliced by the
    * q200/q215/q218 oracles. `minSupport = 1` ≡ no floor. */
  private[ops] val itemsCte: String =
    """items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |          FROM lineitem)""".stripMargin
  private[ops] def pairCte(minSupport: Int): String =
    s"""p AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_pair
       |      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
       |      GROUP BY 1, 2 HAVING count(*) >= $minSupport)""".stripMargin

  /** q200: top-25 co-purchased part pairs — [[pairCounts]] + TakeOrdered
    * top-k with a full deterministic tie-break (n desc, p1, p2).
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
  def q200Copurchase(s: SparkSession, dir: String): DataFrame =
    pairCounts(basketItems(s, dir))
      .withColumnRenamed("n_pair", "n_orders")
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(25)

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
    * Scale shape: the deduped items are localCheckpointed ONCE and feed
    * the basket total, the item supports (one partial+final count,
    * vocab-sized), and both sides of the pair self-join — the corpus
    * dedup never recomputes. The two enrichment joins key on a SINGLE
    * item each (vocab-sized build side — broadcast here, shuffle-join at
    * extreme vocabularies) and the directed expansion is an explode of
    * exactly two orientations per surviving pair — output is
    * rule-count-sized, never basket-sized. The basket total N is the
    * one scalar driver value (a bounded count, q186's bounded-collect
    * class). Lift rides decimal(38,0)/HUGEINT on BOTH numerator and
    * denominator — n_ante·n_cons alone exceeds BIGINT for ubiquitous
    * items in trillion-basket corpora, so no 64-bit product exists
    * anywhere in the lift path (q188's discipline). */
  def q215AssocRules(s: SparkSession, dir: String): DataFrame = {
    val items = basketItems(s, dir).localCheckpoint(true)
    val nBaskets = items.select(countDistinct("ok")).head.getLong(0)
    val support = items.groupBy("pk").agg(count(lit(1)).as("n_item"))
      .localCheckpoint(true) // enrichment reads it twice (ante, cons)
    pairCounts(items)
      .filter(col("n_pair") >= 3)
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
        expr(s"cast((cast(n_pair as decimal(38,0)) * ${nBaskets}L * 10000)" +
          s" div (cast(n_ante as decimal(38,0)) * n_cons) as bigint)")
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
    // Spark's div on positive operands; HUGEINT mirrors decimal(38,0)
    // on the whole lift path)
    "q215_assoc_rules" ->
      s"""WITH $itemsCte,
        |n AS (SELECT count(DISTINCT ok) AS nb FROM items),
        |sup AS (SELECT pk, count(*) AS n_item FROM items GROUP BY 1),
        |${pairCte(3)},
        |d AS (SELECT p1 AS ante, p2 AS cons, n_pair FROM p
        |      UNION ALL SELECT p2, p1, n_pair FROM p),
        |e AS (SELECT d.ante, d.cons, d.n_pair,
        |             sa.n_item AS n_ante, sc.n_item AS n_cons, n.nb
        |      FROM d JOIN sup sa ON d.ante = sa.pk
        |             JOIN sup sc ON d.cons = sc.pk, n
        |      WHERE d.n_pair * 10 >= sa.n_item)
        |SELECT ante, cons, n_pair, n_ante, n_cons,
        |       n_pair * 10000 // n_ante AS conf_bp,
        |       CAST((CAST(n_pair AS HUGEINT) * nb * 10000)
        |            // (CAST(n_ante AS HUGEINT) * n_cons) AS BIGINT) AS lift_bp
        |FROM e ORDER BY lift_bp DESC, ante, cons LIMIT 50""".stripMargin,
    "q200_copurchase" ->
      s"""WITH $itemsCte,
        |${pairCte(1)}
        |SELECT p1, p2, n_pair AS n_orders
        |FROM p
        |ORDER BY n_orders DESC, p1, p2
        |LIMIT 25""".stripMargin,
  )
}
