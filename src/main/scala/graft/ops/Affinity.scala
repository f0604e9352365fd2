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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_copurchase" -> q200Copurchase _,
  )

  val oracle: Map[String, String] = Map(
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
