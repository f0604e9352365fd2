package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built
  * into Spark 4's function library) — the pre-aggregation pattern that
  * makes "distinct users per day / week / all time" viable at 100 TB:
  * sketch each partition (day) ONCE at ingest, persist the ~KB sketch
  * blobs, and answer any coarser rollup by unioning sketches — never
  * re-scanning raw events. `approx_count_distinct` (q36) answers one
  * fixed grouping per scan; sketches compose across groupings and
  * across incremental batches (union is associative and lossless at a
  * fixed lgK, which SketchRollupSpec pins: union-of-daily equals the
  * direct global sketch exactly, not just approximately).
  *
  * ScalaTest-verified (no DuckDB oracle — DuckDB's approx sketch is a
  * different algorithm with different estimates), like SkewJoin and
  * ClusteredWrite. */
object SketchRollup {

  /** `ts` → day bucket through [[T.withTus]]'s schema-dispatched µs
    * epoch (the portability contract both sketch families must share —
    * one definition so HLL days and count-min days can never
    * disagree). */
  private def withDay(events: DataFrame): DataFrame =
    T.withTus(events).withColumn("day", expr("tus div 86400000000"))

  /** Per-day HLL sketches of distinct users — the persisted ingest-time
    * aggregate. One shuffle on day; sketch blobs are ~KB each. */
  def dailyUserSketches(events: DataFrame): DataFrame =
    withDay(events)
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Rollup WITHOUT touching raw events: union the per-day sketches and
    * estimate. Input is days × KB, not events — constant-ish work no
    * matter how large the raw table was. */
  def totalDistinctUsers(daily: DataFrame): Long =
    daily.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .collect()(0).getLong(0)

  // ---- frequency sketches (count-min) ---------------------------------

  /** Per-day count-min sketches of per-user event frequencies — the
    * heavy-hitters counterpart to the HLL distinct-count sketch. Same
    * ingest-time pattern: one shuffle on day, ~KB blob per day. The
    * seed is FIXED: count-min merge is plain counter addition, so
    * same-seed sketches merge EXACTLY (sum of daily tables = direct
    * global table, bit for bit — pinned by SketchRollupSpec), and the
    * estimate error stays one-sided: est ≥ true, est ≤ true + ε·N with
    * probability 1-δ. */
  def dailyUserFreqSketches(events: DataFrame,
                            eps: Double = 0.001,
                            confidence: Double = 0.99): DataFrame =
    withDay(events)
      .groupBy("day")
      .agg(expr(s"count_min_sketch(user_id, ${eps}d, ${confidence}d, 42)")
        .as("cms"),
        count(lit(1)).as("n_events"))

  /** Merges the per-day count-min blobs (days × KB — driver-side merge
    * is the point: no rescan of raw events) and answers per-key
    * frequency queries from the merged sketch. */
  def mergedUserFreq(daily: DataFrame, userIds: Seq[Long]): Map[Long, Long] = {
    import org.apache.spark.util.sketch.CountMinSketch
    val blobs = daily.select("cms").collect().map(_.getAs[Array[Byte]](0))
    if (blobs.isEmpty) return userIds.map(_ -> 0L).toMap // freq of nothing
    val merged = blobs.map(b =>
        CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    userIds.map(u => u -> merged.estimateCount(u)).toMap
  }

  // ---- quantile sketches (fixed-width histograms) ----------------------

  /** Per-day fixed-width histograms of `value` over a declared bounded
    * domain — the MERGEABLE quantile sketch completing the triad
    * (distinct count = HLL, frequency = count-min, quantiles = this).
    * Unlike KLL/t-digest (not in Spark's function library), an
    * equi-width histogram over a known domain merges EXACTLY — counter
    * addition, like count-min — and its quantile error is bounded a
    * priori by the bucket width: the estimate returns a bucket's upper
    * edge, so est ∈ [true, true + (hi−lo)/buckets]. Values are clamped
    * into [lo, hi] (a deployment declares the domain; out-of-range mass
    * lands in the edge buckets and is VISIBLE as edge-bucket counts,
    * never silently dropped). One shuffle on (day, bucket); per-day
    * state is ≤ `buckets` longs — tiny rows, never a blob, and the
    * merge/rollup is itself a distributed aggregate (no driver
    * collect() anywhere on this path). */
  def dailyValueHistograms(events: DataFrame, lo: Double, hi: Double,
                           buckets: Int = 256): DataFrame = {
    require(buckets > 0 && hi > lo, "need hi > lo and buckets > 0")
    withDay(events)
      .withColumn("bucket",
        least(lit(buckets - 1), greatest(lit(0),
          floor((col("value") - lit(lo)) / lit((hi - lo) / buckets))
            .cast("int"))))
      .groupBy("day", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Rolls daily histograms up to any coarser grain (here: global) and
    * answers quantile queries from the merged counts — input is
    * days × buckets rows, never raw events. Returns the upper edge of
    * the bucket containing the q-quantile: est ≥ true quantile and
    * est ≤ true + one bucket width (SketchRollupSpec pins both bounds
    * against the exact percentile, and that merged-of-daily equals the
    * direct global histogram bit-for-bit). */
  def histogramQuantiles(daily: DataFrame, lo: Double, hi: Double,
                         buckets: Int, qs: Seq[Double]): Seq[Double] = {
    require(qs.forall(q => q >= 0 && q <= 1), "quantiles must be in [0,1]")
    val merged = daily.groupBy("bucket").agg(sum("cnt").as("cnt"))
      .orderBy("bucket")
      .collect().map(r => r.getInt(0) -> r.getLong(1)) // ≤ buckets rows
    val total = merged.map(_._2).sum.toDouble
    val width = (hi - lo) / buckets
    val cum = merged.scanLeft((0, 0L)) { case ((_, acc), (b, c)) =>
      (b, acc + c)
    }.tail
    qs.map { q =>
      val target = q * total
      cum.find(_._2 >= target).map { case (b, _) => lo + (b + 1) * width }
        .getOrElse(hi)
    }
  }

  // ---- KLL quantile sketches (unbounded domain) ------------------------

  /** Per-day KLL quantile sketches of `value` — the UNBOUNDED-domain
    * member of the quantile family: [[dailyValueHistograms]] needs a
    * declared [lo, hi] and merges exactly; KLL (Apache DataSketches,
    * on Spark's own classpath) needs NO domain declaration and bounds
    * normalized RANK error (~1.65% at k=200, the library's published
    * single-sketch bound) — the right tool when the metric's range is
    * unknown or drifts (latencies, token counts on a new corpus).
    *
    * Shape: the classic two-level sketch build — each input partition
    * streams into one sketch PER DAY it contains (bounded: days ×
    * sketch-KB per task, the map-side combine), then the tiny
    * (partitions × days) blob frame merges per day. Raw values cross
    * the wire once, already sketched; the day merge moves only KB
    * blobs. KLL merge preserves the rank-error bound (Agarwal et al.,
    * "Mergeable Summaries" — same family as the HLL/CMS/MG members). */
  def dailyValueKll(events: DataFrame, k: Int = 200): DataFrame = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val spark = events.sparkSession
    import spark.implicits._
    val partial = withDay(events)
      .select(col("day"), col("value"))
      .as[(Long, Double)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map[Long, KllDoublesSketch]()
        it.foreach { case (d, v) =>
          m.getOrElseUpdate(d, KllDoublesSketch.newHeapInstance(k))
            .update(v)
        }
        m.iterator.map { case (d, sk) => (d, sk.toByteArray) }
      }
    partial
      .groupByKey(_._1)
      .mapGroups { (day, blobs) =>
        val merged = blobs.map(b =>
          KllDoublesSketch.heapify(Memory.wrap(b._2))).reduce { (a, b) =>
          a.merge(b); a
        }
        (day, merged.toByteArray, merged.getN)
      }
      .toDF("day", "kll", "n")
  }

  /** Merges the per-day KLL blobs (days × KB — never raw events) and
    * answers quantile queries from the union. */
  def mergedKllQuantiles(daily: DataFrame, qs: Seq[Double]): Seq[Double] = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val blobs = daily.select("kll").collect().map(_.getAs[Array[Byte]](0))
    require(blobs.nonEmpty, "no sketches to merge")
    val merged = blobs.map(b => KllDoublesSketch.heapify(Memory.wrap(b)))
      .reduce { (a, b) => a.merge(b); a }
    qs.map(merged.getQuantile)
  }

  // ---- q115: the driver-visible, oracle-checked rollup ----------------

  /** The declared histogram domain for `events.value` (observed range is
    * ~[0, 328]; the clamp makes any drift visible as edge-bucket mass). */
  private val Q115Lo = 0.0
  private val Q115Hi = 400.0
  private val Q115Buckets = 64

  /** q115: the mergeable-sketch pattern as a driver-visible query — the
    * one sketch of the triad whose merge a plain-SQL oracle can mirror
    * EXACTLY (equi-width histograms merge by integer counter addition;
    * HLL/count-min blobs are engine-specific). Per-day histograms of
    * `events.value` (the persisted ingest-time aggregate) are rolled up
    * to global bucket counts by a DISTRIBUTED `groupBy(bucket).sum` —
    * days × buckets rows in, never raw events, and no driver merge on
    * the query path. Cumulative counts come from the two-pass
    * [[ScalableRank.withGlobalCumsumExclusive]] prefix scan (a global
    * `Window.orderBy` would funnel all rows to one task — bounded here
    * at ≤64 rows, but the declared ops keep the scale-safe shape on
    * principle), and each row carries its bucket's upper edge plus
    * is_p50/is_p90/is_p99 flags marking the bucket whose cumulative
    * count first crosses q·total — the quantile-edge readout, est ∈
    * [true, true + bucket width]. The grand total rides a 1-row
    * broadcast crossJoin (the q73/q90/q97/q113 bounded exception).
    * Multiplier literals stay in double (`0.5e0` on the DuckDB side):
    * IEEE × and the bigint→double promotion round identically in both
    * engines, so the flag comparisons can never disagree. */
  def q115HistogramRollup(s: SparkSession, dir: String): DataFrame = {
    val width = (Q115Hi - Q115Lo) / Q115Buckets // 6.25 — exact in binary
    val daily = dailyValueHistograms(T(s, dir, "events"),
      Q115Lo, Q115Hi, Q115Buckets)
    // bounded: ≤ buckets rows. Checkpointed so the cumsum pass and the
    // 1-row total aggregate don't each re-run the per-day histogram scan.
    val merged = daily.groupBy("bucket").agg(sum("cnt").as("cnt"))
      .localCheckpoint(true)
    val total = merged.agg(sum("cnt").as("total"))
    def crosses(q: Double) =
      (col("cum_cnt") >= lit(q) * col("total")) &&
        (col("cum_cnt") - col("cnt") < lit(q) * col("total"))
    ScalableRank
      .withGlobalCumsumExclusive(merged, col("cnt"), "excl", col("bucket"))
      .withColumn("cum_cnt", col("excl") + col("cnt"))
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        (lit(Q115Lo) + (col("bucket") + 1) * lit(width)).as("edge"),
        col("cnt"), col("cum_cnt"),
        crosses(0.5).cast("int").as("is_p50"),
        crosses(0.9).cast("int").as("is_p90"),
        crosses(0.99).cast("int").as("is_p99"))
      .orderBy("bucket")
  }

  /** Misra–Gries counter budget for q163 — must exceed the heaviness
    * denominator (50): MG with k counters underestimates any count by
    * at most N/(k+1), so every item with true count > N/(k+1) survives
    * the sketch; k = 64 > 50 makes the candidate set a guaranteed
    * SUPERSET of the ≥ N/50 heavy hitters. */
  private[ops] val MgK = 64
  private[ops] val HeavyDenom = 50

  /** q163: exact heavy hitters by the two-pass sketch-then-verify
    * pattern — words holding ≥ 1/50 of all corpus tokens, WITHOUT a
    * full-vocabulary shuffle. Pass 1 aggregates a [[MisraGries]]
    * sketch (mergeable, counter-bounded — the frequency-family sibling
    * of the HLL rollups above) plus the token total in ONE corpus
    * scan; pass 2 recounts ONLY the ≤ k candidate words exactly (a
    * broadcast semi-filter — the shuffle carries candidate matches,
    * never the vocabulary) and keeps those crossing the exact
    * threshold.
    *
    * Determinism despite a partitioning-dependent sketch: the
    * candidate SET varies with merge order, but it is always a
    * superset of the true heavies (the MG guarantee), and the exact
    * recount + threshold filter prunes everything else — so the OUTPUT
    * is the exact heavy-hitter set, bit-stable, and the plain-SQL
    * oracle (GROUP BY + HAVING against the total) must match it
    * row-for-row. MgSpec pins the superset guarantee on adversarial
    * streams and merge-order invariance of the final result. */
  def q163HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = T(s, dir, "documents")
      .select(explode(expr("filter(split(text, ' '), x -> x != '')"))
        .as("word"))
    val mg = udaf(new MisraGries(MgK),
      org.apache.spark.sql.Encoders.STRING)
    val cands = toks
      .agg(mg(col("word")).as("cands"), count(lit(1)).as("n"))
      .select(explode(col("cands")).as("word"), col("n"))
    toks.join(broadcast(cands), "word")
      .groupBy("word", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * HeavyDenom >= col("n"))
      .select(col("word"), col("cnt"))
      .orderBy(col("cnt").desc, col("word"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_histogram_rollup" -> q115HistogramRollup _,
    "q163_heavy_hitters" -> q163HeavyHitters _,
  )

  /** The oracle mirrors the two-level structure (per-day histograms,
    * then the counter-addition merge) so the hash match proves the
    * MERGE exact, not just the final histogram. */
  val oracle: Map[String, String] = Map(
    "q115_histogram_rollup" ->
      """WITH h AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         least(63, greatest(0,
        |           CAST(floor((value - 0.0e0) / 6.25e0) AS INT))) AS bucket,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cnt FROM h GROUP BY bucket
        |), c AS (
        |  SELECT bucket, cnt,
        |         CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum_cnt,
        |         CAST(sum(cnt) OVER () AS BIGINT) AS total
        |  FROM m
        |)
        |SELECT CAST(bucket AS INT) AS bucket,
        |       0.0e0 + (bucket + 1) * 6.25e0 AS edge,
        |       cnt, cum_cnt,
        |       CAST(cum_cnt >= 0.5e0 * total
        |            AND cum_cnt - cnt < 0.5e0 * total AS INT) AS is_p50,
        |       CAST(cum_cnt >= 0.9e0 * total
        |            AND cum_cnt - cnt < 0.9e0 * total AS INT) AS is_p90,
        |       CAST(cum_cnt >= 0.99e0 * total
        |            AND cum_cnt - cnt < 0.99e0 * total AS INT) AS is_p99
        |FROM c ORDER BY bucket""".stripMargin,
    // plain GROUP BY + HAVING — the sketch must reproduce the exact
    // answer, which is precisely the two-pass pattern's claim
    "q163_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
        |c AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1)
        |SELECT word, cnt FROM c, tot WHERE cnt * $HeavyDenom >= n
        |ORDER BY cnt DESC, word""".stripMargin,
  )
}
