package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern that makes 100 TB ETL affordable: a stored per-key aggregate
  * is brought up to date by merging ONLY the new batch's partial
  * aggregate, never by re-reading the base facts. The complement to
  * q104's incremental DEDUP (which probes a persisted index): here the
  * persisted state is itself the aggregate, and "merge" is union +
  * re-aggregate — the partial/final split Spark already performs inside
  * one query, lifted across BATCH BOUNDARIES.
  *
  * The discipline that makes this correct is MERGEABILITY: count and
  * sum merge by summing; avg must be STORED as (sum, count) and divided
  * at read time; distinct counts must be stored as mergeable sketches
  * (q36/q115's HLL discipline) — a stored avg or exact-distinct column
  * is the classic unmergeable-MV bug. This op stores only counts and
  * integer-cent sums, both trivially mergeable.
  */
object MvRefresh {

  /** Batch split: a deterministic hash of the order key — batch 1
    * (~80%) plays the role of "all history already aggregated", batch 2
    * (~20%) is "today's load". */
  private[sink] def batchTag = pmod(xxhash64(col("o_orderkey")), lit(10L))

  private def monthAgg(df: DataFrame): DataFrame =
    df.withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))

  /** The stored MV: batch 1's monthly aggregate, written once per
    * (JVM, dataset) — months × 2 columns, compact regardless of fact
    * volume. */
  private[sink] def ensureBaseAgg(s: SparkSession, dir: String): String =
    ScratchExport.once(s"mv-base:$dir") {
      val out = ScratchExport.scratchDir("graft-mvbase-")
      monthAgg(T(s, dir, "orders").filter(batchTag < 8))
        .write.mode("overwrite").parquet(out)
      out
    }

  /** q203: refresh = stored MV ∪ delta's partial aggregate → final
    * re-aggregate. The plan reads the months-sized MV parquet and ONE
    * scan of the new batch — the base facts never re-aggregate
    * (MvRefreshSpec pins exactly one orders scan in the refresh plan);
    * at 100 TB the refresh cost is O(delta + months), while the full
    * recompute the DuckDB oracle runs is O(history). Equality of the
    * two is the mergeability proof. */
  def q203MvRefresh(s: SparkSession, dir: String): DataFrame = {
    val base = s.read.parquet(ensureBaseAgg(s, dir))
    val delta = monthAgg(T(s, dir, "orders").filter(batchTag >= 8))
    base.unionByName(delta)
      .groupBy("o_month")
      .agg(sum("n_orders").as("n_orders"),
        sum("sum_price_c2").as("sum_price_c2"))
      .orderBy("o_month")
  }

  // ---- q257: incremental JOIN-view maintenance ----------------------

  private[sink] val UpdMod = 97L   // ΔA updates: price +100 c2
  private[sink] val TombMod = 101L // ΔA tombstones (precedence over update)
  private[sink] val InsMod = 103L  // ΔA inserts at key + InsOffset
  private[sink] val CustMod = 89L  // ΔB: segment moves to 'MOVED'
  private[sink] val InsOffset = 1000000000000L

  /** The stored join view V = orders ⋈ customer (key columns, segment,
    * integer-cents price) — materialized once per (JVM, dataset), the
    * "all history already joined" state. */
  private[sink] def ensureJoinMv(s: SparkSession, dir: String): String =
    ScratchExport.once(s"mv-join:$dir") {
      val out = ScratchExport.scratchDir("graft-mvjoin-")
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("price_c2"))
        .join(T(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg")),
          col("o_custkey") === col("c_custkey"))
        .drop("c_custkey")
        .write.mode("overwrite").parquet(out)
      out
    }

  /** q257: incremental maintenance of a JOIN view under CDC on BOTH
    * inputs — the IVM (incremental view maintenance) algebra q203's
    * aggregate-only refresh cannot express, and the reason join MVs are
    * hard where aggregate MVs are easy: a one-row change to the
    * DIMENSION invalidates every joined fact row that references it.
    * Deltas are key-image upsert batches (the q183/q233 CDC contract):
    * ΔA = order updates (mod [[UpdMod]]), tombstones (mod [[TombMod]],
    * precedence over update), inserts (mod [[InsMod]] at key +
    * [[InsOffset]]); ΔB = segment moves for mod-[[CustMod]] customers.
    *
    * The maintained view is assembled from THREE disjoint delta-bounded
    * terms, never a re-join of history:
    *  - KEPT: stored V minus rows keyed by an affected order OR an
    *    affected customer — two broadcast ANTI joins against
    *    delta-key sets (V streams once; at 100 TB this is the only
    *    V-sized pass, and it is exchange-free);
    *  - ΔA ⋈ B′: the order upserts joined to the OVERLAID dimension
    *    (base customer with ΔB images coalesced on top) — broadcast of
    *    the delta, dimension streams;
    *  - A′ ⋈ ΔB: the surviving base orders of affected customers
    *    re-joined to their NEW segment — the dimension-fan-out term, a
    *    semi-join-pruned orders scan bounded by the affected
    *    customers' order counts (on a custkey-clustered fact this is
    *    footer-pruned too; it is the irreducible cost of dimension
    *    change, which is why SCD2 q98 versions instead of updating).
    * Completeness/disjointness: every V′ row is in exactly one term by
    * the affected-key case split (JoinMvSpec pins the partition and
    * row-level equality against a direct A′ ⋈ B′ recompute).
    *
    * Graded: per-segment count + cents sum of the maintained view; the
    * DuckDB oracle recomputes from RAW tables with the same deltas
    * applied declaratively — a hash match proves the algebra lost,
    * duplicated, and staled nothing (the moved customers' rows must
    * land under 'MOVED', tombstoned orders must vanish, inserts must
    * appear). */
  def q257JoinMv(s: SparkSession, dir: String): DataFrame =
    maintainedAgg(maintainedView(s, dir))

  /** The maintained V′ frame itself — exposed so JoinMvSpec can check
    * ROW-level equality against a direct A′ ⋈ B′ recompute, not just
    * the graded aggregate. */
  private[sink] def maintainedView(s: SparkSession, dir: String): DataFrame = {
    val v = s.read.parquet(ensureJoinMv(s, dir))
    val orders = T(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("price_c2"))
    val cust = T(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))

    // ΔB: full new images (derived; production receives these as a batch)
    val dB = cust.filter(col("c_custkey") % CustMod === 0)
      .select(col("c_custkey"), lit("MOVED").as("seg"))
    // ΔA upserts (tombstones excluded by precedence) + inserts
    val dAUps = orders
      .filter(col("o_orderkey") % UpdMod === 0 &&
        col("o_orderkey") % TombMod =!= 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("price_c2") + 100L).as("price_c2"))
      .unionByName(orders.filter(col("o_orderkey") % InsMod === 0)
        .select((col("o_orderkey") + InsOffset).as("o_orderkey"),
          col("o_custkey"), (col("price_c2") + 55L).as("price_c2")))
    // affected-key sets (delta-sized by construction)
    val affA = orders
      .filter(col("o_orderkey") % UpdMod === 0 ||
        col("o_orderkey") % TombMod === 0)
      .select("o_orderkey")
    val affB = dB.select(col("c_custkey").as("o_custkey"))

    // B′: the dimension with delta images overlaid
    val bPrime = cust
      .join(dB.select(col("c_custkey"), col("seg").as("new_seg")),
        Seq("c_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("new_seg"), col("seg")).as("seg"))

    val kept = v
      .join(broadcast(affA), Seq("o_orderkey"), "left_anti")
      .join(broadcast(affB), Seq("o_custkey"), "left_anti")
    val t1 = broadcast(dAUps)
      .join(bPrime, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("price_c2"), col("seg"))
    val t2 = orders
      .join(broadcast(affB), Seq("o_custkey"), "left_semi")
      .join(broadcast(affA), Seq("o_orderkey"), "left_anti")
      .join(broadcast(dB.select(col("c_custkey"), col("seg"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("price_c2"), col("seg"))

    kept.select("o_orderkey", "o_custkey", "price_c2", "seg")
      .unionByName(t1).unionByName(t2)
  }

  private[sink] def maintainedAgg(vPrime: DataFrame): DataFrame =
    vPrime.groupBy("seg")
      .agg(count(lit(1)).as("n_rows"), sum("price_c2").as("sum_price_c2"))
      .orderBy("seg")

  // ---- q275: aggregate maintenance under RETRACTION -------------------

  /** Tombstone ticket: ~9% of order keys receive a delete image in
    * today's load (GDPR erasure, cancellations, late voids). */
  private[sink] val RetractMod = 11L

  /** q275: the aggregate-MV algebra q203 deliberately lacks —
    * RETRACTION. q203's refresh is append-only (union + re-aggregate);
    * the moment the CDC feed carries deletes, an append-only MV goes
    * silently stale, and a "full recompute on any delete" falls back to
    * O(history). The fix is SIGNED partial aggregates: every delta row
    * carries a weight (+1 insert, −1 tombstone), the delta's partial
    * aggregate sums `w` and `w·cents`, and the merge is the SAME union
    * + re-aggregate as q203 — counts and sums are abelian-group
    * aggregates, so retraction is just addition of inverses. Keys whose
    * count reaches 0 drop out of the view (the group vanished). The
    * non-invertible aggregates (min/max, distinct) are exactly the ones
    * this algebra CANNOT maintain — documented boundary; they need
    * q221-style recompute or sketch bounds.
    *
    * Fixture mechanics: tombstones derive from history by md5 ticket
    * (mod [[RetractMod]]); in production the delete IMAGES arrive on
    * the CDC feed (the q183/q257 contract) — the stored MV is never
    * re-read beyond its months-sized self, and the base scan here
    * stands in for the delta feed. Graded against a raw recompute with
    * the deletions applied declaratively. */
  def q275MvRetract(s: SparkSession, dir: String): DataFrame = {
    val base = s.read.parquet(ensureBaseAgg(s, dir))
      .select(col("o_month"), col("n_orders").as("w"),
        col("sum_price_c2").as("wc"))
    val tick = s"cast(conv(substring(md5(concat('ret:', " +
      s"cast(o_orderkey as string))), 1, 12), 16, 10) as bigint) % $RetractMod = 0"
    // tombstones ticket over the WHOLE key space: a batch-2 key hit by
    // the ticket arrives as insert + same-day void (+1 then −1, net 0)
    // — the CDC feed's normal shape, and what keeps the oracle free of
    // the engine-specific batch hash
    val inserts = T(s, dir, "orders").filter(batchTag >= 8)
      .withColumn("w", lit(1L))
    val tombs = T(s, dir, "orders").filter(expr(tick))
      .withColumn("w", lit(-1L))
    val delta = inserts.unionByName(tombs)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy("o_month")
      .agg(sum("w").as("w"),
        sum(expr("w * cast(round(o_totalprice * 100) as bigint)")).as("wc"))
    base.unionByName(delta)
      .groupBy("o_month")
      .agg(sum("w").as("n_orders"), sum("wc").as("sum_price_c2"))
      .filter(col("n_orders") > 0)
      .orderBy("o_month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q203_mv_refresh" -> q203MvRefresh _,
    "q257_join_mv" -> q257JoinMv _,
    "q275_mv_retract" -> q275MvRetract _,
  )

  /** The oracle is the FULL recompute over all history — equality
    * proves the merge lost and duplicated nothing. */
  val oracle: Map[String, String] = Map(
    // q257: the deltas applied DECLARATIVELY to the raw tables (no view,
    // no algebra) — A′ = orders minus tombstones with bumped updates
    // plus offset inserts; B′ = customer with moved segments; then the
    // plain join + aggregate. Equality proves the three-term
    // maintenance lost, duplicated, and staled nothing.
    "q257_join_mv" ->
      s"""WITH aq AS (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT)
        |           + CASE WHEN o_orderkey % $UpdMod = 0 THEN 100 ELSE 0 END AS price_c2
        |  FROM orders WHERE o_orderkey % $TombMod <> 0
        |  UNION ALL
        |  SELECT o_orderkey + $InsOffset, o_custkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) + 55
        |  FROM orders WHERE o_orderkey % $InsMod = 0),
        |bq AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % $CustMod = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg
        |  FROM customer)
        |SELECT b.seg, count(*) AS n_rows,
        |       CAST(sum(a.price_c2) AS BIGINT) AS sum_price_c2
        |FROM aq a JOIN bq b ON a.o_custkey = b.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q275: the raw recompute with deletions applied declaratively —
    // history minus the tombstone ticket, plus today's batch untouched
    "q275_mv_retract" ->
      s"""WITH live AS (
        |  SELECT o_orderdate, o_totalprice FROM orders
        |  WHERE ('0x' || substr(md5('ret:' || o_orderkey::VARCHAR), 1, 12))::BIGINT
        |          % $RetractMod <> 0)
        |SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_c2
        |FROM live GROUP BY 1 HAVING count(*) > 0 ORDER BY 1""".stripMargin,
    "q203_mv_refresh" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
