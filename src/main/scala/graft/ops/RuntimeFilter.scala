package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime join-filter pruning — the one scan-reduction pattern the
  * inventory's static layouts (q108 Z-order, q110 buckets, q133 hive
  * partitions) cannot express: the prune key set is only known at RUN
  * time, after a dimension-side filter executes. The classic fix — what
  * Spark's own `spark.sql.optimizer.runtime.bloomFilter` and every
  * warehouse's "join filter" do — is to build a Bloom filter over the
  * filtered dimension's join keys and evaluate it against the fact side
  * BELOW the join, so non-matching rows die in the scan stage instead
  * of traveling through the exchange. Built explicitly here (rather than
  * flipping Spark's conf) so the pattern is visible, deterministic, and
  * plan-auditable.
  *
  * Exactness: a Bloom filter admits false positives but NEVER false
  * negatives, and the exact equi-join above it removes every false
  * positive — so the query's result is byte-identical to the plain
  * join the DuckDB oracle runs. The filter is pure optimization, which
  * is precisely why it needs a plan audit as well as an oracle (a
  * broken bloom that admits everything still passes correctness).
  *
  * Hash discipline: bit positions are `xxhash64(key, i) mod m` computed
  * with Spark's own codegen'd `xxhash64` expression on BOTH the build
  * and probe sides — one implementation, so build/probe can never
  * disagree (the classic homemade-bloom bug class). The probe tests all
  * k bits against a 2048-word `array<bigint>` LITERAL embedded in the
  * plan: element_at + shift + mask, all codegen'd, no UDF.
  */
object RuntimeFilter {

  /** m — filter bits (2¹⁷ = 16 KiB as 2048 longs). A model constant:
    * sized for the dimension-side NDV, never data-volume-bound. */
  private[ops] val BloomBits = 1 << 17

  /** k — probes per key. */
  private[ops] val BloomHashes = 4

  /** Bit position of probe `i` for `key` — shared by build and probe. */
  private def hashPos(key: Column, i: Int): Column =
    pmod(xxhash64(key, lit(i)), lit(BloomBits.toLong))

  /** Build: a distributed bitmap-OR — each key's k positions become
    * (word, mask) pairs, partial `bit_or` aggregates pack them
    * map-side, and the driver receives at most m/64 non-empty WORDS
    * (2048 longs here), a model constant — never key-bound. This is
    * the build that survives raising m: the driver cost is words, the
    * shuffle is one bit_or cell per (partition × word). */
  private[ops] def buildBloom(keys: DataFrame, keyCol: String): Array[Long] = {
    val posCols = (0 until BloomHashes).map(i => hashPos(col(keyCol), i))
    val words = new Array[Long](BloomBits / 64)
    keys.select(explode(array(posCols: _*)).as("pos"))
      .groupBy(shiftright(col("pos"), 6).as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        col("pos").bitwiseAND(lit(63L)).cast("int"))).as("mask"))
      .collect()
      .foreach(r => words(r.getLong(0).toInt) |= r.getLong(1))
    words
  }

  /** Probe: true iff all k bits for `key` are set in `bits`. The word
    * array rides the plan as an `array<bigint>` literal (one broadcast
    * reference object per stage, shared by codegen), so the test is
    * `element_at` + variable shift + mask — fully codegen'd, O(k). */
  private[ops] def mightContain(bits: Array[Long], key: Column): Column = {
    val words = typedlit(bits.toIndexedSeq)
    (0 until BloomHashes).map { i =>
      val pos = hashPos(key, i)
      val word = element_at(words, (shiftright(pos, 6) + 1).cast("int"))
      call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** q198: revenue by supplier for ONE nation's suppliers, with the
    * lineitem side pre-pruned by a runtime Bloom filter over the
    * filtered suppliers' keys. The dimension filter (n_name) selects
    * ~4% of suppliers, so ~96% of lineitem rows die at the scan stage
    * — before the join, and crucially before any exchange the join
    * strategy needs.
    *
    * Scale shape: at test scale the tiny dimension broadcasts anyway
    * and the bloom "only" saves probe work; the 100 TB story is the
    * regime where the DIMENSION no longer broadcasts (10⁸ filtered
    * keys → SMJ) but its bloom still does — m is a constant 16 KiB
    * here and a few hundred MB at warehouse NDVs, always ≪ the keys
    * themselves (no payload, ~10 bits/key) — so the fact side sheds
    * its non-matching rows BEFORE the sort-merge exchange, which is
    * where the real money is. The build's driver collect is bounded by
    * m, not by keys. Revenue in exact integer c4 units (the q135
    * cents discipline). */
  def q198BloomPrune(s: SparkSession, dir: String): DataFrame = {
    val dim = T(s, dir, "supplier")
      .join(broadcast(T(s, dir, "nation").filter(col("n_name") === "NATION_5")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    val bits = buildBloom(dim.select("s_suppkey"), "s_suppkey")
    val fact = T(s, dir, "lineitem")
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .filter(mightContain(bits, col("l_suppkey")))
    fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(
        sum(expr("cast(round(l_extendedprice * 100) as bigint) * " +
          "(100 - cast(round(l_discount * 100) as bigint))")).as("revenue_c4"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue_c4").desc, col("s_suppkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_bloom_prune" -> q198BloomPrune _,
  )

  /** The oracle is the PLAIN join — the bloom must be invisible in the
    * result (no false negatives; the join removes false positives). */
  val oracle: Map[String, String] = Map(
    "q198_bloom_prune" ->
      """SELECT s.s_suppkey, s.s_name,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
        |         AS revenue_c4,
        |       count(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE n.n_name = 'NATION_5'
        |GROUP BY 1, 2
        |ORDER BY revenue_c4 DESC, s.s_suppkey""".stripMargin,
  )
}
