package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** North-star LLM-data-pipeline + eventing ops (SURVEY.md §2.3 q70–q81).
  *
  * Event time is an exact ns-epoch long (see [[T]]); 30 min = 1.8e12 ns,
  * 1 h = 3.6e12 ns, 5 min = 3e11 ns.
  */
object NorthStar {

  /** q70: exact dedup cardinality, hash-first: distinct over
    * `sha2(text)` so the shuffle carries 32-byte digests instead of full
    * document bodies (at 100 TB the raw-text shuffle IS the corpus).
    * Same count as `count(DISTINCT text)` modulo SHA-256 collisions;
    * the oracle computes the identical digest on its side. */
  def q70DedupExact(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .agg(countDistinct(sha2(col("text"), 256)).as("n_distinct_text"))

  /** q71: keyed latest-wins dedup via ranking window (latest = max µs
    * event time — quantized so same-µs ties break identically on both
    * engines, via event_id desc). */
  def q71DedupKeyed(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("tus").desc, col("event_id").desc)
    T.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id")
      .orderBy("user_id", "event_type")
  }

  /** q73: brute-force cosine top-k vs a single reference vector.
    * One-row broadcast crossJoin — no shuffle of the big side; dot and
    * norms run through the codegen'd [[graft.functions.FixDot]]
    * (r12): INTEGER sums over the 2¹⁶-quantized grid, so the value —
    * and the rank — cannot depend on any engine's reduction order
    * (the q160 lesson, applied to the whole similarity stack; the
    * VecDot double fold this replaced assumed the oracle summed in
    * the same order). */
  def q73SimCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val ref = emb.filter(col("vec_id") === 0).select(col("embedding").as("ref_emb"))
    val dot = graft.functions.FixDot.dot(col("embedding"), col("ref_emb"))
      .cast("double")
    val normA = sqrt(graft.functions.FixDot.normSq(col("embedding"))
      .cast("double"))
    val normB = sqrt(graft.functions.FixDot.normSq(col("ref_emb"))
      .cast("double"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(ref))
      .withColumn("sim_raw", dot / (normA * normB))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim_raw"), 4).as("sim"))
  }

  /** q74: tokenize + explode word count (the Generator/UDTF axis). */
  def q74TextWordcount(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)

  /** q75: scalar Scala UDF (string reverse). */
  def q75UdfScalar(s: SparkSession, dir: String): DataFrame = {
    val rev = udf((v: String) => Option(v).map(_.reverse).orNull)
    T(s, dir, "region")
      .select(col("r_regionkey"), rev(col("r_name")).as("reversed"))
      .orderBy("r_regionkey")
  }

  /** q76: typed Aggregator UDAF — weighted average with partial+final
    * merge (map-side combine at scale). */
  def q76UdafWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedAvg,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    T(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("wavg"))
      .orderBy("l_returnflag")
  }

  /** q80: 1-hour tumbling window aggregation (batch mode). Buckets are
    * computed on µs (1 h = 3.6e9 µs) — a pure projection + partial/final
    * hash agg, no window, scale-safe. */
  def q80EventTumbling(s: SparkSession, dir: String): DataFrame =
    T.events(s, dir)
      .select(expr("(tus div 3600000000) * 3600000000").as("ws_us"),
        col("event_type"), col("value"))
      .groupBy("ws_us", "event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_val"))
      .orderBy("ws_us", "event_type")

  /** q169: HOPPING (sliding) window aggregation — 1-hour windows every
    * 15 minutes, the overlapping-window shape q80's tumbling buckets
    * can't express (each event lands in exactly len/slide = 4 windows;
    * a trend dashboard or rate alarm reads the 1-h total refreshed
    * every 15 min). Semantically identical to Spark's own
    * `window($"ts", "1 hour", "15 minutes")` — HoppingWindowSpec pins
    * that equality — but computed on the canonical µs integers:
    * explode each event over the 4 slide offsets (exactly the
    * expansion `TimeWindow` lowers to) so both engines bucket with the
    * same exact integer arithmetic (1 h = 3.6e9 µs, 15 min = 9e8 µs).
    *
    * Scale shape: a 4-row `explode(sequence)` projection (output-bound,
    * ×len/slide — the inherent cost of hopping semantics, same as
    * Spark's native expansion) into the standard partial+final hash
    * agg; no window function, one shuffle of (window, type) cells. */
  def q169EventHopping(s: SparkSession, dir: String): DataFrame =
    T.events(s, dir)
      .select(col("tus"), col("event_type"), col("value"))
      .withColumn("k", explode(expr("sequence(0, 3)")))
      .select(
        expr("((tus div 900000000) - k) * 900000000").as("ws_us"),
        col("event_type"), col("value"))
      .groupBy("ws_us", "event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_val"))
      .orderBy("ws_us", "event_type")

  /** q81: sessionization with 30-min inactivity gap (lag + cumulative sum). */
  def q81EventSessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeCore(T.events(s, dir)
      .select(col("user_id"), col("event_id"), col("tus")))
      .orderBy("user_id", "session_id")

  /** The q81 core on any `(user_id, event_id, tus)` frame — separated so
    * SessionizeProps can cross-check the lag+cumsum formulation against
    * an independent split-on-gaps scan (the DuckDB oracle runs the SAME
    * formulation, so it shares any misconception in this shape). */
  private[ops] def sessionizeCore(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all event-time arithmetic in µs (30 min = 1.8e9 µs) — the precision
    // both engines share exactly (DuckDB reads the ns parquet µs-truncated)
    e
      .withColumn("prev", lag("tus", 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("is_new").over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("cnt"),
        min(col("tus")).as("min_us"),
        max(col("tus")).as("max_us"))
  }

  /** q120: event-transition matrix — the first-order sequence-mining op
    * (Markov transition counts): for each user's event stream in strict
    * event-time order, count (from_type → to_type) adjacent pairs across
    * the whole corpus. This is the path-analysis complement to q103's
    * fixed funnel (which asks about ONE ordained sequence; the matrix
    * surfaces which sequences exist). Ordering is (µs-quantized ts,
    * event_id) — the unique-tiebreak contract every windowed event query
    * here uses. The window is partitioned on user_id (per-user streams
    * are ingest-bounded — no skew surface), and the matrix aggregate
    * output is |event_types|² rows, constant in corpus size. */
  def q120EventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    T.events(s, dir)
      .select(col("user_id"), col("event_id"), col("tus"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** q206: time-weighted average value per user — the step-function
    * integral (TWAP / metrics-billing shape) the row-weighted mean gets
    * WRONG whenever sampling is irregular: a value held for an hour must
    * weigh 3600× one held a second, so each event's value carries until
    * the user's next event and the mean weights by held duration.
    *
    * Exactness (the r12 FixDot discipline applied to time weighting):
    * each value quantizes ONCE to the 2¹⁶ grid (⌊v·2¹⁶+½⌋ — a fixed
    * chain of singly-rounded scalar ops, exact cross-engine), each
    * segment contributes the INTEGER product vfx·dur_µs accumulated in
    * decimal(38,0) (associative — no reduction-order exposure; a
    * per-user Σ dur·vfx can exceed BIGINT at real spans), and the final
    * division is one half-up integer step on the fx grid, so `twap` =
    * twap_fx/2¹⁶ is the identical double in any engine.
    *
    * Scale shape: ONE per-user window (lead — per-user streams are
    * ingest-bounded, no skew surface) and one partial+final aggregate on
    * user_id; output is user-count-sized. The half-up division is
    * half-up only for non-negative numerators (both engines truncate
    * toward zero, so a negative Σ would silently round half-DOWN);
    * DataContractSpec pins `events.value ≥ 0` so the direction never
    * varies. */
  def q206Twap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    T.events(s, dir)
      .select(col("user_id"), col("tus"), col("event_id"),
        expr("cast(floor(cast(value as double) * 65536.0 + 0.5) as bigint)")
          .as("vfx"))
      .withColumn("dur", lead("tus", 1).over(w) - col("tus"))
      .filter(col("dur").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_segments"),
        sum("dur").as("active_us"),
        sum(col("vfx").cast("decimal(38,0)") * col("dur")).as("num"))
      .filter(col("active_us") > 0)
      .select(col("user_id"), col("n_segments"), col("active_us"),
        expr("cast((2 * num + active_us) div (2 * active_us) as bigint)")
          .as("twap_fx"))
      .withColumn("twap", col("twap_fx").cast("double") / 65536.0d)
      .orderBy("user_id")
  }

  /** q132: OHLC resampling — the time-series downsample (telemetry /
    * market-data shape): per (event_type, epoch-day), first value, max,
    * min, last value, and count. `min_by`/`max_by` pick the endpoints in
    * ONE aggregate pass — no window, no sort, no self-join back to the
    * extremal row (the classic formulations all shuffle more). Ties are
    * impossible by construction: the ordinal is the fixed-width
    * zero-padded (µs, event_id) string, unique per event and
    * lexicographically = numerically ordered, so `min_by`'s
    * tie-arbitrariness (and the cross-engine divergence it would cause)
    * never arises. Partial+final aggregation applies as with any
    * hash agg — at 100 TB this is one shuffle of (type, day) cells. */
  def q132EventOhlc(s: SparkSession, dir: String): DataFrame = {
    val e = T.events(s, dir)
      .select(col("event_type"),
        expr("tus div 86400000000").as("day"),
        col("value"),
        concat(lpad(expr("cast(tus as string)"), 20, "0"),
          lpad(col("event_id").cast("string"), 10, "0")).as("ord"))
    e.groupBy("event_type", "day")
      .agg(round(min_by(col("value"), col("ord")), 4).as("open"),
        round(max(col("value")), 4).as("high"),
        round(min(col("value")), 4).as("low"),
        round(max_by(col("value"), col("ord")), 4).as("close"),
        count(lit(1)).as("volume"))
      .orderBy("event_type", "day")
  }

  /** q164: session-sequence training examples — the behavioral
    * next-event-prediction dataset a sequence model trains on: per
    * (user, 30-min-gap session) with ≥ 3 events, the event-type
    * sequence in strict event-time order splits into a PREFIX (the
    * model input, fingerprinted — exchanges and compares carry the md5,
    * never the sequence text, the q117 discipline) and the final event
    * as the LABEL. The q92/q159 packing story applied to events: q81
    * proves the sessionization, q164 materializes the training
    * example.
    *
    * Scale shape: the session window partitions by user_id (per-user
    * streams are ingest-bounded), and the sequence assembly is one
    * ObjectHashAggregate whose buffer is a single session's events —
    * bounded by the 30-minute gap semantics, never a corpus slice;
    * ordering inside the buffer is the deterministic (tus, event_id)
    * sort applied AFTER collection, so aggregation order can't perturb
    * the fingerprint. */
  def q164SessionExamples(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, dir)
      .select(col("user_id"), col("event_id"), col("tus"),
        col("event_type"))
      .withColumn("prev", lag("tus", 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("is_new").over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        expr("""transform(
                  array_sort(collect_list(struct(tus, event_id, event_type))),
                  x -> x.event_type)""").as("seq"))
      .filter(col("n_events") >= 3)
      .select(col("user_id"), col("session_id"), col("n_events"),
        md5(concat_ws(" ", expr("slice(seq, 1, size(seq) - 1)")))
          .as("prefix_md5"),
        expr("element_at(seq, -1)").as("label"))
      .orderBy("user_id", "session_id")
  }

  /** The streaming session-example OUTPUT contract as a batch
    * formulation over any `(user_id, event_id, tus, event_type)` frame
    * — exactly what [[graft.streaming.EventStreams.sessionExamples]]
    * emits once every session has closed (a stream has no global
    * session ordinal, so unlike q164 the ordinal is dropped). Factored
    * so THREE independent derivations meet on it: the streaming state
    * machine (StreamBatchParitySpec's micro-batch replay), this batch
    * plan, and q193's DuckDB oracle — the cross-engine check the
    * self-parity spec alone could not give the state machine. */
  private[graft] def sessionExamplesBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("tus"),
        col("event_type"))
      .withColumn("prev", lag("tus", 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("is_new").over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        expr("""transform(
                  array_sort(collect_list(struct(tus, event_id, event_type))),
                  x -> x.event_type)""").as("seq"))
      .filter(col("n_events") >= 3)
      .select(col("user_id"), col("n_events"),
        md5(concat_ws(" ", expr("slice(seq, 1, size(seq) - 1)")))
          .as("prefix_md5"),
        expr("element_at(seq, -1)").as("label"))
      .orderBy("user_id", "n_events", "prefix_md5", "label")
  }

  /** q193: the STREAMING operator's output, graded — q164 checks the
    * sessionization with its batch ordinal; q193 checks the exact
    * schema the continuous [[graft.streaming.EventStreams
    * .sessionExamples]] state machine materializes (what a downstream
    * trainer actually consumes from the stream), against a DuckDB
    * oracle. Same scale shape as q164 (per-user windows, bounded
    * session buffers); rows can legitimately repeat (same user, same
    * sequence in two sessions), so the ORDER BY spans all four
    * columns. */
  def q193SessionExamplesBatch(s: SparkSession, dir: String): DataFrame =
    sessionExamplesBatch(T.events(s, dir))

  /** The attribution-audit OUTPUT contract as a batch projection —
    * literally [[graft.streaming.EventStreams.attributionAudit]] (the
    * left-outer stream-stream interval join; `withWatermark` is
    * eliminated on a batch frame) with the timestamps lowered to µs
    * BIGINTs for the render-stable compare. Factored so three
    * derivations meet on ONE plan: the streaming micro-batch replay
    * (StreamBatchParitySpec pins stream == this), this batch
    * formulation, and q232's DuckDB oracle — the same triangle q193
    * gave sessionExamples. Input needs `(event_id, user_id, ts,
    * event_type, value)`. */
  private[graft] def attributionAuditBatch(events: DataFrame): DataFrame =
    graft.streaming.EventStreams.attributionAudit(events)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        expr("unix_micros(p_ts)").as("p_us"),
        expr("unix_micros(c_ts)").as("c_us"), col("value"))
      .orderBy("purchase_id", "click_id")

  /** q232: the streaming attribution AUDIT graded — each purchase
    * left-outer interval-joined to the same user's clicks in the
    * preceding hour; purchases with NO qualifying click survive with
    * null click columns (the "unattributed conversions" audit an inner
    * join cannot ask). This was the one EventStreams member whose
    * arithmetic never met DuckDB (the parity spec only proved
    * stream == batch SELF-consistency); now the shared batch plan is
    * hash-checked cross-engine and the parity spec pins the stream to
    * the DECLARED query.
    *
    * Scale shape: equi hash/sort-merge join on user_id with the time
    * range as residual — never a cross product; in streaming the same
    * two-sided time bound is what makes join state watermark-bounded.
    * All time math in µs integers; `ts` is reconstructed from the
    * schema-drift-proof `tus` so the plan is byte-identical across
    * testdata regenerations. */
  def q232AttributionAuditBatch(s: SparkSession, dir: String): DataFrame =
    attributionAuditBatch(
      T.events(s, dir).select(col("event_id"), col("user_id"),
        expr("timestamp_micros(tus)").as("ts"), col("event_type"),
        col("value")))

  /** q199: peak concurrent sessions per day — the interval-overlap
    * aggregate ("how many sessions were live at the busiest instant of
    * each day"), the capacity-planning question raw per-bucket counts
    * (q80) cannot answer because a session contributes to every instant
    * it SPANS, not just its event times. Sessions come from the same
    * lag+cumsum core as q81 (30-min gap, closed intervals
    * [min_us, max_us]); each is clipped to the day(s) it touches, then
    * swept: +1 at its clipped start, −1 at its clipped end, ordered by
    * (t, delta DESC) so a session starting at the very µs another ends
    * counts both as concurrent (closed-interval tie rule, identical in
    * the oracle), and the peak is the max of the running sum.
    *
    * Scale shape — hierarchical sweep: a single per-day sweep window is
    * the classic scale trap (one day of a 100 TB stream is one task), so
    * the running sum is DECOMPOSED: per (day, hour) windows compute each
    * bucket's delta-sum and max-prefix over at most 1/24th of a day,
    * then a 24-row-per-day window turns bucket sums into carry-ins and
    * the day peak is max(carry + bucket max-prefix) — exact (max-prefix
    * decomposes associatively over integer buckets; ties between equal
    * (t, delta) rows cannot move any prefix value), and the widest
    * window anywhere is one HOUR of deltas. At 100 TB you pick the
    * refinement level to match volume (hour → minute) without touching
    * the combine; the DuckDB oracle runs the single-level formulation,
    * so the decomposition itself is what correctness checks. */
  def q199ConcurrencyPeak(s: SparkSession, dir: String): DataFrame = {
    val DayUs = T.DayUs
    val HourUs = 3600000000L
    val sess = sessionizeCore(T.events(s, dir)
      .select(col("user_id"), col("event_id"), col("tus")))
      .select("min_us", "max_us")
    val spans = sess
      .withColumn("day",
        explode(expr(s"sequence(min_us div $DayUs, max_us div $DayUs)")))
      .select(col("day"),
        greatest(col("min_us"), col("day") * DayUs).as("gs"),
        least(col("max_us"), (col("day") + 1) * DayUs - 1).as("ge"))
    val deltas = spans.select(col("day"), col("gs").as("t"), lit(1L).as("delta"))
      .unionAll(spans.select(col("day"), col("ge").as("t"), lit(-1L).as("delta")))
      .withColumn("hb", expr(s"(t - day * $DayUs) div $HourUs"))
    val wRun = Window.partitionBy("day", "hb").orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val buckets = deltas
      .withColumn("running", sum("delta").over(wRun))
      .groupBy("day", "hb")
      .agg(sum("delta").as("bsum"), max("running").as("bmax"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("bstarts"))
    val wCarry = Window.partitionBy("day").orderBy("hb")
      .rowsBetween(Window.unboundedPreceding, -1)
    buckets
      .withColumn("carry", coalesce(sum("bsum").over(wCarry), lit(0L)))
      .groupBy("day")
      .agg(max(col("carry") + col("bmax")).as("peak_cc"),
        sum("bstarts").as("n_sessions"))
      .select((col("day") * DayUs).as("day_us"), col("peak_cc"),
        col("n_sessions"))
      .orderBy("day_us")
  }

  /** q204: last-touch attribution — for every purchase, which event the
    * user did LAST before it (within a 7-day lookback): the
    * marketing/causal complement to q103's ordained funnel and q120's
    * global transition matrix, and the one event query whose carry
    * needs an IGNORE-NULLS frame: the attributed event is the last
    * NON-purchase row strictly before the current row, which lag()
    * cannot express when purchases cluster (lag(1) would see the
    * previous purchase).
    *
    * Mechanics: one per-user window ordered by the (tus, event_id)
    * unique-tiebreak contract, frame [unbounded, -1], carrying
    * `last(when(type <> 'purchase', struct(tus, type)), ignoreNulls)`
    * — both fields of the SAME carried event, so the lookback test and
    * the attributed type can never disagree. Purchases whose carried
    * event is absent or older than 7 days attribute to '(none)'. The
    * aggregate is a tiny (attr_type) count.
    *
    * Scale shape: q81's user-partitioned window class (bounded by
    * per-user history; hot users are the knob — cap the lookback WINDOW
    * in rows or days upstream if one user's stream outgrows a task);
    * the shuffle carries (user, tus, id, type) — 4 narrow columns —
    * and one exchange feeds both the window and nothing else; the
    * final count is the degenerate few-row aggregate. */
  def q204Attribution(s: SparkSession, dir: String): DataFrame = {
    val LookbackUs = 604800000000L // 7 days in µs
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    T.events(s, dir)
      .select(col("user_id"), col("event_id"), col("tus"), col("event_type"))
      .withColumn("carry",
        last(when(col("event_type") =!= "purchase",
          struct(col("tus").as("t"), col("event_type").as("ty"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(
        when(col("carry.t") >= col("tus") - LookbackUs, col("carry.ty")),
        lit("(none)")).as("attr_type"))
      .groupBy("attr_type")
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy("attr_type")
  }

  /** q252: per-user interval-UNION coverage — "how much wall-clock was
    * this user actually active", with each event holding the line for
    * its own `value` seconds: total covered time with overlaps
    * collapsed, distinct activity islands, and utilization of the
    * user's span. The interval-algebra member the event family still
    * lacked: q81 merges POINTS by gap, q199 sweeps for the global
    * concurrency PEAK, q206 integrates a carried VALUE — none of them
    * answers uptime/SLA/billing's "union of possibly-engulfing
    * intervals" (a long call absorbs the short ones inside it; gap
    * logic on points gets that wrong).
    *
    * Mechanics — the cummax gaps-and-islands form, NOT lag: intervals
    * are half-open [tus, tus + dur) with `dur = ⌊value·10⁶ + ½⌋` µs
    * (q206's singly-rounded quantization chain, exact cross-engine); an
    * interval starts a NEW island iff its start exceeds the running max
    * END of every earlier interval (frame [unbounded, −1]) — comparing
    * against lag(end) alone is the classic bug this op exists to pin:
    * an engulfing interval's end must keep counting after later shorter
    * ones. Touching intervals (start == running max) merge; either
    * convention preserves the union LENGTH, this one is pinned. Island
    * union = max(end) − min(start), exact because an island by
    * construction has no internal gap. A zero-span user (single
    * zero-duration event) defines util_bp = 10⁴ (covered == span,
    * degenerately total) — both engines state the identical constant.
    *
    * Scale shape: q81's user-partitioned window class (per-user streams
    * are ingest-bounded), ONE exchange feeding two same-spec windows
    * (cummax + island cumsum re-use the sort), then two partial+final
    * aggregates; output is user-count-sized. */
  def q252IntervalUnion(s: SparkSession, dir: String): DataFrame =
    intervalUnionCore(T.events(s, dir)
      .select(col("user_id"), col("event_id"), col("tus"),
        expr("cast(floor(cast(value as double) * 1000000.0 + 0.5) as bigint)")
          .as("dur")))

  /** The islands machinery under q252, on any (user_id, event_id, tus,
    * dur) frame — split out so IntervalUnionSpec can drive the
    * ENGULFING fixture (one long interval swallowing several short
    * ones) through the exact graded plan: that case is where a
    * lag(end)-based island rule silently differs from the cummax one. */
  private[graft] def intervalUnionCore(in: DataFrame): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val prevMax = ord.rowsBetween(Window.unboundedPreceding, -1)
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    in
      .withColumn("e", col("tus") + col("dur"))
      .withColumn("pmax", max("e").over(prevMax))
      .withColumn("is_new",
        when(col("pmax").isNull || col("tus") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island", sum("is_new").over(cum))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_iv"), min("tus").as("s"), max("e").as("ee"))
      .groupBy("user_id")
      .agg(sum("n_iv").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("ee") - col("s")).as("covered_us"),
        (max("ee") - min("s")).as("span_us"))
      .withColumn("util_bp",
        expr("case when span_us > 0 then (covered_us * 10000) div span_us " +
          "else 10000 end"))
      .orderBy("user_id")
  }

  /** q211: inter-event-gap histogram in power-of-2 buckets — the
    * HdrHistogram/latency-telemetry shape: per-user consecutive-event
    * gaps, bucketed by ⌊log₂(gap_µs)⌋. The log is EXACT integer
    * arithmetic in both engines: ⌊log₂ n⌋ = length(bin(n)) − 1 (bit
    * length of the binary rendering — no floating log, no libm ulp
    * hazard; zero gaps get their own bucket −1). Buckets are
    * policy-bounded (≤ 64 rows ever), so the aggregate output is
    * constant-sized at any corpus scale; the only corpus-sized stages
    * are the per-user lead window (q81's ingest-bounded class) and one
    * partial+final aggregate on the bucket id. Per-bucket min/max gaps
    * ride along as the range sanity the histogram consumer reads. */
  /** The per-gap frame shared by the q211 histogram and the streaming
    * twin's parity spec ([[graft.streaming.EventStreams.gapPoints]]):
    * one row per consecutive-event pair, gap attributed to the LATER
    * event (lag semantics — what a live monitor can emit on arrival;
    * the gap MULTISET is identical to the lead formulation, so the
    * graded histogram is unchanged). */
  def gapPairs(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    events
      .select(col("user_id"), col("tus"), col("event_id"))
      .withColumn("prev_tus", lag("tus", 1).over(w))
      .filter(col("prev_tus").isNotNull)
      .withColumn("gap", col("tus") - col("prev_tus"))
  }

  def q211GapHistogram(s: SparkSession, dir: String): DataFrame = {
    gapPairs(T.events(s, dir))
      .withColumn("b", when(col("gap") === 0L, lit(-1L))
        .otherwise((length(expr("bin(gap)")) - 1).cast("long")))
      .groupBy("b")
      .agg(count(lit(1)).as("n_gaps"),
        min("gap").as("min_gap"), max("gap").as("max_gap"))
      .withColumn("lo_us", when(col("b") < 0L, lit(0L))
        .otherwise(expr("shiftleft(1L, cast(b as int))")))
      .select(col("b"), col("lo_us"), col("n_gaps"),
        col("min_gap"), col("max_gap"))
      .orderBy("b")
  }

  /** q222: rolling 7-day distinct users — the WAU/rolling-reach metric
    * every analytics stack reports: for each day with events, the EXACT
    * count of distinct users active in the trailing 7-day window
    * [d−6, d]. Exact sliding distinct does not decompose (per-day
    * distinct counts cannot be merged), so the scale-safe formulation
    * is CONTRIBUTION EXPLODE, not a range join: collapse events to
    * distinct (day, user) once, explode each to the ≤7 window days it
    * serves (`sequence(day, day+6)` — a bounded Generate, q169's
    * hopping-window lowering), dedup (window, user), and count per
    * window — every stage a partial+final aggregate on bounded fan-out.
    * A range join (`e.day BETWEEN d.day−6 AND d.day`) re-reads each
    * event row once per covered window through a join; the explode
    * emits exactly the same pairs in one pass with no join at all. The
    * oracle deliberately RUNS the range-join formulation — a hash match
    * proves the two lowerings equivalent. Reported days are restricted
    * to days that themselves have events (the semi-join), so no
    * phantom trailing windows appear after the last event. Output is
    * calendar-bounded. */
  def q222RollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val DayUs = T.DayUs
    // checkpointed: the explode AND the event-days restriction both read
    // the collapsed (day, user) table — without it the days subtree
    // would re-scan the event corpus
    val dayUsers = T.events(s, dir)
      .select(expr(s"tus div $DayUs").as("day"), col("user_id"))
      .distinct()
      .localCheckpoint(true)
    val days = dayUsers.select(col("day").as("wday")).distinct()
    dayUsers
      .select(explode(expr("sequence(day, day + 6)")).as("wday"),
        col("user_id"))
      .distinct()
      .join(days, "wday") // report only days that have events
      .groupBy("wday")
      .agg(count(lit(1)).as("users_7d"))
      .select((col("wday") * DayUs).as("day_us"), col("users_7d"))
      .orderBy("day_us")
  }

  /** q212: nearest-event temporal alignment — for every order, the
    * event of the SAME user closest in time to the order date (the
    * sensor-fusion / feature-lookup join: "attach the nearest reading
    * to each observation"). q26's as-of join answers "latest at or
    * before"; nearest needs BOTH directions and a distance compare, and
    * the scale-safe formulation is NOT a per-user quadratic join but
    * q204's carry applied twice to the time-merged union: events and
    * orders interleave in one per-user stream sorted (t, tag, id) with
    * events first at equal t, a forward pass carries the last event AT
    * OR BEFORE each order (equal-time events land here, dist 0 — the
    * sort seats them before the order), a backward pass (reversed sort)
    * carries the first event STRICTLY AFTER (the reversed order seats
    * orders before same-t events, so equal-t events are never in the
    * backward carry), and each order picks the nearer (ties → the
    * at-or-before event, dp ≤ dn; users with no events → '(none)').
    * Dropping one carry to change direction policy: the FORWARD carry
    * is the one that owns equal-time matches.
    *
    * All distances are exact µs BIGINTs (order dates cast to timestamp
    * at UTC midnight — the same instant DuckDB's CAST yields under the
    * pinned UTC session). Scale: two per-user window passes over the
    * union (ingest-bounded), no join wider than the union itself;
    * output is orders-sized. */
  def q212NearestEvent(s: SparkSession, dir: String): DataFrame = {
    val ev = T.events(s, dir)
      .select(col("user_id").as("u"), col("tus").as("t"), lit(0).as("tag"),
        col("event_id").as("id"), col("event_type"),
        lit(null).cast("long").as("o_orderkey"))
    val ords = T(s, dir, "orders")
      .select(col("o_custkey").as("u"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("t"),
        lit(1).as("tag"), lit(null).cast("long").as("id"),
        lit(null).cast("string").as("event_type"), col("o_orderkey"))
    val uni = ev.unionByName(ords)
    val evStruct = when(col("tag") === 0,
      struct(col("t").as("et"), col("id").as("eid"),
        col("event_type").as("ety")))
    // NULL-free total sort key: Spark seats NULLs first on asc,
    // DuckDB's default differs — coalescing onto the orderkey removes
    // the divergence surface entirely
    val sid = coalesce(col("id"), col("o_orderkey"))
    val wFwd = Window.partitionBy("u")
      .orderBy(col("t"), col("tag"), sid)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wBwd = Window.partitionBy("u")
      .orderBy(col("t").desc, col("tag").desc, sid.desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    uni
      .withColumn("prev", last(evStruct, ignoreNulls = true).over(wFwd))
      .withColumn("next", last(evStruct, ignoreNulls = true).over(wBwd))
      .filter(col("tag") === 1)
      .withColumn("dp", col("t") - col("prev.et"))
      .withColumn("dn", col("next.et") - col("t"))
      // ONE pick decision, projected three ways — three copies of the
      // tie predicate could silently diverge under a later tie-rule edit
      .withColumn("pick", when(col("prev").isNotNull &&
          (col("next").isNull || col("dp") <= col("dn")),
          struct(col("prev.eid").as("eid"), col("prev.ety").as("ety"),
            col("dp").as("d")))
        .otherwise(struct(col("next.eid").as("eid"), col("next.ety").as("ety"),
          col("dn").as("d"))))
      .select(col("o_orderkey"), col("u").as("user_id"),
        col("pick.eid").as("near_event_id"),
        coalesce(col("pick.ety"), lit("(none)")).as("near_type"),
        col("pick.d").as("dist_us"))
      .orderBy("o_orderkey")
  }

  private[graft] val EwmaTaps = 16

  /** q238: exact dyadic EWMA smoothing + spike flag — the per-sensor
    * exponential smoother every telemetry/monitoring pipeline runs
    * before alerting (q44's moving average weights history uniformly;
    * an EWMA halves each older reading, which is what "recent matters
    * more" means). α = 1/2 truncated to [[EwmaTaps]] taps makes it
    * EXACT integer arithmetic: with readings in cents,
    * `ewma_fx = Σ_{i=0..15} cents[t−i] · 2^(15−i)` is the smoothed
    * value on a 2⁻¹⁶ fixed-point grid (missing history contributes 0 —
    * the standard zero-initialized filter), and the tap 15 truncation
    * error is < 2⁻¹⁶ of one reading. No double ever enters: the same
    * FixDot/q160 discipline, applied to time-series smoothing. A
    * reading spikes when it exceeds 1.8× its own smoothed value
    * (`5·cents·2¹⁶ > 9·ewma_fx` — the multiplier is alert policy,
    * exact at any rational threshold via cross-multiplication), gated
    * on a full 16-tap history so a zero-padded warmup can never
    * false-fire.
    *
    * Scale shape: the 16 lags share ONE window spec, so Spark computes
    * them in a single per-user window pass (ingest-bounded, the
    * q81/q204 class — hot-user capping applies unchanged, RUNBOOK);
    * the ordering key (tus, event_id) is NULL-free and total, so both
    * engines sort identically. Output: the user_id ≡ 0 (mod 3) sample,
    * one row per event. */
  def q238EwmaSmooth(s: SparkSession, dir: String): DataFrame =
    ewmaCore(T.events(s, dir)
      .filter(col("user_id") % 3 === 0)
      .select(col("user_id"), col("event_id"), col("tus"),
        expr("cast(round(value * 100) as bigint)").as("v_c2")))
      .orderBy("user_id", "tus", "event_id")

  /** The q238 filter body over any `(user_id, event_id, tus, v_c2)`
    * frame — shared with the streaming twin
    * ([[graft.streaming.EventStreams.ewmaPoints]]), whose parity spec
    * pins the incremental state machine against exactly this window
    * formulation (the q193/q232 three-way loop: stream == declared
    * batch == DuckDB). */
  private[graft] def ewmaCore(in: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val ewma = (0 until EwmaTaps).map { i =>
      coalesce(lag(col("v_c2"), i).over(w), lit(0L)) *
        lit(1L << (EwmaTaps - 1 - i))
    }.reduce(_ + _)
    in
      .withColumn("ewma_fx", ewma)
      .withColumn("full_hist",
        lag(col("v_c2"), EwmaTaps - 1).over(w).isNotNull)
      .withColumn("spike",
        col("full_hist") && col("v_c2") * 327680L > col("ewma_fx") * 9L)
      .drop("full_hist")
  }

  /** q286 lateness budgets (µs): one minute and one hour. */
  private[ops] val LateW1 = 60000000L
  private[ops] val LateW2 = 3600000000L

  /** q286: the late-data census — the measurement every watermark
    * budget should be SET from instead of guessed: replaying the
    * event stream in ARRIVAL order, how many events would a watermark
    * of W have dropped, i.e. arrive with event time below the running
    * max event time already seen minus W? Reported per event type at
    * [[LateW1]]/[[LateW2]] with shares in bp — the number that decides
    * `withWatermark` budgets for every streaming member (RUNBOOK's
    * watermark row points here).
    *
    * Arrival order: production replays the real ingest sequence
    * (offsets, file order); the fixture's events are perfectly
    * time-ordered by construction, so arrival is DERIVED as event time
    * plus a deterministic transit delay (md5 ticket: ~20% of events
    * delayed up to 2 h) — the census then measures genuine disorder,
    * and the spec pins both budgets firing differently.
    *
    * The scale point: "running max over arrival order" is the global
    * ordered prefix scan — q286 rides
    * [[ScalableRank.withGlobalCummaxExclusive]] (range-partitioned
    * local prefix maxes + broadcast offsets), never a single-task
    * window; the census is then one type-sized aggregate. */
  def q286LateCensus(s: SparkSession, dir: String): DataFrame = {
    val tick = "cast(conv(substring(md5(concat('arr:', " +
      "cast(event_id as string))), 1, 12), 16, 10) as bigint)"
    val ev = T.events(s, dir).select("event_id", "event_type", "tus")
      .withColumn("arr", expr(s"tus + case when $tick % 10 < 2 " +
        s"then (($tick div 10) % 7200) * 1000000 else 0 end"))
    ScalableRank.withGlobalCummaxExclusive(ev, col("tus"), "runmax",
        col("arr"), col("event_id"))
      .groupBy("event_type")
      // compared as tus + W < runmax: the global first row carries the
      // Long.MinValue exclusive-prefix sentinel, and runmax − W would
      // wrap below it (tus + W cannot overflow on the µs grid)
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("tus") + LateW1 < col("runmax"), 1L).otherwise(0L))
          .as("late_1m"),
        sum(when(col("tus") + LateW2 < col("runmax"), 1L).otherwise(0L))
          .as("late_1h"))
      .withColumn("late_1m_bp", expr("(late_1m * 10000) div n_events"))
      .withColumn("late_1h_bp", expr("(late_1h * 10000) div n_events"))
      .orderBy("event_type")
  }

  /** q290: 3-step path mining — the navigation-analysis extension of
    * q120's pairwise transitions: the top-10 most-traveled CONSECUTIVE
    * event-type triples across users (product analytics reads these to
    * find the highways and the dead ends a 2-step matrix blurs:
    * view→click→purchase and view→click→view share a prefix but tell
    * opposite stories). Paths come from two leads over the per-user
    * event order (bounded windows — q81's ingest-bounded class), one
    * path-sized aggregate, and TakeOrdered for the top-10 on the
    * (count desc, path) total order — longer k-grams are one more
    * lead each, same plan shape. */
  def q290PathMining(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    T.events(s, dir)
      .select(col("user_id"), col("tus"), col("event_id"),
        col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q290_path_mining" -> q290PathMining _,
    "q286_late_census" -> q286LateCensus _,
    "q238_ewma_smooth" -> q238EwmaSmooth _,
    "q211_gap_histogram" -> q211GapHistogram _,
    "q222_rolling_distinct" -> q222RollingDistinct _,
    "q212_nearest_event" -> q212NearestEvent _,
    "q70_dedup_exact" -> q70DedupExact _,
    "q199_concurrency_peak" -> q199ConcurrencyPeak _,
    "q204_attribution" -> q204Attribution _,
    "q252_interval_union" -> q252IntervalUnion _,
    "q164_session_examples" -> q164SessionExamples _,
    "q193_session_examples_batch" -> q193SessionExamplesBatch _,
    "q232_attribution_audit" -> q232AttributionAuditBatch _,
    "q120_event_transitions" -> q120EventTransitions _,
    "q132_event_ohlc" -> q132EventOhlc _,
    "q206_twap" -> q206Twap _,
    "q71_dedup_keyed" -> q71DedupKeyed _,
    "q73_sim_cosine_topk" -> q73SimCosineTopk _,
    "q74_text_wordcount" -> q74TextWordcount _,
    "q75_udf_scalar" -> q75UdfScalar _,
    "q76_udaf_weighted_avg" -> q76UdafWeightedAvg _,
    "q80_event_tumbling" -> q80EventTumbling _,
    "q81_event_sessionize" -> q81EventSessionize _,
    "q169_event_hopping" -> q169EventHopping _,
  )

  val oracle: Map[String, String] = Map(
    // q286: the exclusive running max stated as a native window (the
    // Spark side's two-pass lowering is the scale device; the hash
    // match proves the lowerings agree); NULL runmax on the first row
    // falls to the ELSE like the Spark sentinel comparison
    // q290: the same per-user lead triples and (count desc, path) order
    "q290_path_mining" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS tus, event_id, event_type,
        |             lead(event_type, 1) OVER w AS t2,
        |             lead(event_type, 2) OVER w AS t3
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT event_type || '>' || t2 || '>' || t3 AS path, count(*) AS n
        |FROM p WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "q286_late_census" ->
      s"""WITH a AS (SELECT event_id, event_type, epoch_us(ts) AS tus,
        |             epoch_us(ts) + (CASE WHEN
        |               ('0x' || substr(md5('arr:' || event_id::VARCHAR), 1, 12))::BIGINT % 10 < 2
        |             THEN ((('0x' || substr(md5('arr:' || event_id::VARCHAR), 1, 12))::BIGINT // 10) % 7200) * 1000000
        |             ELSE 0 END) AS arr
        |           FROM events),
        |r AS (SELECT event_type, tus,
        |        max(tus) OVER (ORDER BY arr, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
        |      FROM a),
        |g AS (SELECT event_type, count(*) AS n,
        |        sum(CASE WHEN tus + $LateW1 < runmax THEN 1 ELSE 0 END) AS l1,
        |        sum(CASE WHEN tus + $LateW2 < runmax THEN 1 ELSE 0 END) AS l2
        |      FROM r GROUP BY 1)
        |SELECT event_type, n AS n_events,
        |       CAST(l1 AS BIGINT) AS late_1m, CAST(l2 AS BIGINT) AS late_1h,
        |       CAST((l1 * 10000) // n AS BIGINT) AS late_1m_bp,
        |       CAST((l2 * 10000) // n AS BIGINT) AS late_1h_bp
        |FROM g ORDER BY 1""".stripMargin,
    // q238: the identical 16-tap dyadic filter — one named window, the
    // same zero-padded warmup, the same integer spike inequality
    "q238_ewma_smooth" -> {
      val taps = (0 until EwmaTaps).map(i =>
        s"COALESCE(lag(v_c2, $i) OVER w, 0) * ${1L << (EwmaTaps - 1 - i)}")
        .mkString(" + ")
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |                  CAST(round(value * 100) AS BIGINT) AS v_c2
        |           FROM events WHERE user_id % 3 = 0),
        |s AS (SELECT user_id, event_id, tus, v_c2,
        |             CAST($taps AS BIGINT) AS ewma_fx,
        |             lag(v_c2, ${EwmaTaps - 1}) OVER w IS NOT NULL AS full_hist
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT user_id, event_id, tus, v_c2, ewma_fx,
        |       (full_hist AND v_c2 * 327680 > ewma_fx * 9) AS spike
        |FROM s ORDER BY user_id, tus, event_id""".stripMargin
    },
    // q211: identical integer log2 via bit length of bin(); zero gaps
    // q222: the oracle runs the OTHER lowering — a range join over the
    // distinct (day, user) pairs — so a hash match proves the explode
    // and the range join compute the same windows
    "q222_rolling_distinct" ->
      """WITH e AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |           FROM events),
        |d AS (SELECT DISTINCT day FROM e)
        |SELECT d.day * 86400000000 AS day_us,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS users_7d
        |FROM d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // in bucket -1
    "q211_gap_histogram" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |g AS (SELECT lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS gap
        |      FROM e),
        |b AS (SELECT gap, CASE WHEN gap = 0 THEN -1 ELSE length(bin(gap)) - 1 END AS b
        |      FROM g WHERE gap IS NOT NULL)
        |SELECT CAST(b AS BIGINT) AS b,
        |       CAST(CASE WHEN b < 0 THEN 0 ELSE (CAST(1 AS BIGINT) << CAST(b AS INT)) END AS BIGINT) AS lo_us,
        |       count(*) AS n_gaps,
        |       CAST(min(gap) AS BIGINT) AS min_gap,
        |       CAST(max(gap) AS BIGINT) AS max_gap
        |FROM b GROUP BY b ORDER BY b""".stripMargin,
    // q212: the same two-direction carry over the time-merged union;
    // three scalar last_value IGNORE NULLS per direction over the
    // IDENTICAL frame pick the same event row (q204's consistency
    // argument); the sort key coalesces onto the orderkey so no NULL
    // ordering divergence exists
    "q212_nearest_event" ->
      """WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS t, 0 AS tag,
        |              event_id AS id, event_type,
        |              CAST(NULL AS BIGINT) AS o_orderkey
        |            FROM events),
        |os AS (SELECT o_custkey AS u, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS t,
        |              1 AS tag, CAST(NULL AS BIGINT) AS id,
        |              CAST(NULL AS VARCHAR) AS event_type, o_orderkey
        |       FROM orders),
        |uni AS (SELECT *, coalesce(id, o_orderkey) AS sid FROM ev
        |        UNION ALL SELECT *, coalesce(id, o_orderkey) AS sid FROM os),
        |c AS (SELECT *,
        |  last_value(CASE WHEN tag = 0 THEN t END IGNORE NULLS) OVER fwd AS pt,
        |  last_value(CASE WHEN tag = 0 THEN id END IGNORE NULLS) OVER fwd AS pid,
        |  last_value(CASE WHEN tag = 0 THEN event_type END IGNORE NULLS) OVER fwd AS pty,
        |  last_value(CASE WHEN tag = 0 THEN t END IGNORE NULLS) OVER bwd AS nt,
        |  last_value(CASE WHEN tag = 0 THEN id END IGNORE NULLS) OVER bwd AS nid,
        |  last_value(CASE WHEN tag = 0 THEN event_type END IGNORE NULLS) OVER bwd AS nty
        |  FROM uni
        |  WINDOW fwd AS (PARTITION BY u ORDER BY t, tag, sid
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         bwd AS (PARTITION BY u ORDER BY t DESC, tag DESC, sid DESC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT o_orderkey, u AS user_id,
        |  CASE WHEN pt IS NOT NULL AND (nt IS NULL OR t - pt <= nt - t)
        |       THEN pid ELSE nid END AS near_event_id,
        |  coalesce(CASE WHEN pt IS NOT NULL AND (nt IS NULL OR t - pt <= nt - t)
        |                THEN pty ELSE nty END, '(none)') AS near_type,
        |  CASE WHEN pt IS NOT NULL AND (nt IS NULL OR t - pt <= nt - t)
        |       THEN t - pt ELSE nt - t END AS dist_us
        |FROM c WHERE tag = 1 ORDER BY o_orderkey""".stripMargin,
    // q206: identical fx quantize → lead-segment → integer-weighted sum;
    // HUGEINT accumulates the vfx·dur products (decimal(38,0) on the
    // Spark side), half-up integer division on the fx grid
    "q206_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |             CAST(floor(CAST(value AS DOUBLE) * 65536.0 + 0.5) AS BIGINT) AS vfx
        |           FROM events),
        |seg AS (SELECT user_id, vfx,
        |          lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS dur
        |        FROM e),
        |a AS (SELECT user_id, count(*) AS n_segments,
        |        sum(dur) AS active_us,
        |        sum(CAST(vfx AS HUGEINT) * dur) AS num
        |      FROM seg WHERE dur IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_segments, CAST(active_us AS BIGINT) AS active_us,
        |  CAST((2 * num + active_us) // (2 * active_us) AS BIGINT) AS twap_fx,
        |  CAST(CAST((2 * num + active_us) // (2 * active_us) AS BIGINT) AS DOUBLE) / 65536.0 AS twap
        |FROM a WHERE active_us > 0 ORDER BY user_id""".stripMargin,
    // q252: the single-level window form of the identical cummax
    // islands — same quantization, same strict-gap island rule, same
    // degenerate zero-span constant
    "q252_interval_union" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |             CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS dur
        |           FROM events),
        |x AS (SELECT user_id, tus, event_id, tus + dur AS e FROM e),
        |p AS (SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM x),
        |n AS (SELECT *, CASE WHEN pmax IS NULL OR tus > pmax THEN 1 ELSE 0 END AS is_new FROM p),
        |g AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM n),
        |i AS (SELECT user_id, island, count(*) AS n_iv, min(tus) AS s, max(e) AS ee
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
        |       CAST(count(*) AS BIGINT) AS n_islands,
        |       CAST(sum(ee - s) AS BIGINT) AS covered_us,
        |       CAST(max(ee) - min(s) AS BIGINT) AS span_us,
        |       CAST(CASE WHEN max(ee) - min(s) > 0
        |            THEN (sum(ee - s) * 10000) // (max(ee) - min(s))
        |            ELSE 10000 END AS BIGINT) AS util_bp
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q70_dedup_exact" ->
      "SELECT count(DISTINCT sha256(text)) AS n_distinct_text FROM documents",
    // q204: DuckDB's IGNORE NULLS carries the same last-non-purchase
    // event; two last_value calls over the identical frame pick the
    // same row, so type and timestamp stay consistent
    "q204_attribution" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events),
        |l AS (SELECT *,
        |        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS carry_ty,
        |        last_value(CASE WHEN event_type <> 'purchase' THEN tus END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS carry_t
        |      FROM e)
        |SELECT coalesce(CASE WHEN carry_t >= tus - 604800000000 THEN carry_ty END,
        |                '(none)') AS attr_type,
        |       CAST(count(*) AS BIGINT) AS n_purchases
        |FROM l WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q199's oracle is the SINGLE-LEVEL sweep (one window per day) —
    // deliberately a different formulation than the engine's
    // hour-decomposed one, so the hierarchical decomposition itself is
    // what the cross-engine check verifies.
    "q199_concurrency_peak" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |l AS (SELECT user_id, event_id, tus,
        |             lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
        |      FROM x),
        |n AS (SELECT user_id, event_id, tus,
        |             CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS is_new
        |      FROM l),
        |g AS (SELECT user_id, tus,
        |             sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM n),
        |sess AS (SELECT min(tus) AS min_us, max(tus) AS max_us
        |         FROM g GROUP BY user_id, session_id),
        |spans AS (SELECT unnest(generate_series(min_us // 86400000000,
        |                                        max_us // 86400000000)) AS day,
        |                 min_us, max_us
        |          FROM sess),
        |clip AS (SELECT day, greatest(min_us, day * 86400000000) AS gs,
        |                least(max_us, (day + 1) * 86400000000 - 1) AS ge
        |         FROM spans),
        |d AS (SELECT day, gs AS t, 1 AS delta FROM clip
        |      UNION ALL SELECT day, ge, -1 FROM clip),
        |r AS (SELECT day, delta,
        |             sum(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |      FROM d)
        |SELECT day * 86400000000 AS day_us,
        |       CAST(max(running) AS BIGINT) AS peak_cc,
        |       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q132_event_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, value,
        |         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
        |         lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord
        |  FROM events)
        |SELECT event_type, day,
        |       round(arg_min(value, ord), 4) AS open,
        |       round(max(value), 4) AS high,
        |       round(min(value), 4) AS low,
        |       round(arg_max(value, ord), 4) AS close,
        |       CAST(count(*) AS BIGINT) AS volume
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q120_event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events),
        |n AS (SELECT event_type AS from_type,
        |             lead(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS to_type
        |      FROM e)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |FROM n WHERE to_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q71_dedup_keyed" ->
      """SELECT user_id, event_type, event_id
        |FROM (SELECT user_id, event_type, event_id,
        |             row_number() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q73_sim_cosine_topk" ->
      // FixDot twin: integer dot / integer-norm sqrts — the list_sum
      // runs over BIGINTs, so the oracle engine's reduction order
      // cannot move a bit (the old per-element sum() aggregate could)
      s"""WITH r AS (SELECT embedding AS re FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT e.vec_id,
        |      CAST(${TrainingData.oFxDot("e.embedding", "r.re")} AS DOUBLE) AS dot,
        |      ${TrainingData.oFxNorm("e.embedding")} AS na,
        |      ${TrainingData.oFxNorm("r.re")} AS nb
        |      FROM embeddings e CROSS JOIN r WHERE e.vec_id <> 0)
        |SELECT vec_id, round(dot / (na * nb), 4) AS sim
        |FROM s ORDER BY dot / (na * nb) DESC, vec_id LIMIT 10""".stripMargin,
    "q74_text_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "q75_udf_scalar" ->
      "SELECT r_regionkey, reverse(r_name) AS reversed FROM region ORDER BY 1",
    "q76_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q80_event_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws_us,
        |       event_type, count(*) AS cnt, round(sum(value), 4) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q169_event_hopping" ->
      """SELECT ((epoch_us(ts) // 900000000) - h.k) * 900000000 AS ws_us,
        |       event_type, count(*) AS cnt, round(sum(value), 4) AS sum_val
        |FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) h
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q164_session_examples" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events),
        |l AS (SELECT *, lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM x),
        |n AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS is_new FROM l),
        |g AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |      FROM n),
        |a AS (SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |             list(event_type ORDER BY tus, event_id) AS seq
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, session_id, n_events,
        |       md5(array_to_string(seq[1:len(seq)-1], ' ')) AS prefix_md5,
        |       seq[-1] AS label
        |FROM a WHERE n_events >= 3 ORDER BY user_id, session_id""".stripMargin,
    // q232: the identical left-outer interval join in plain SQL — all
    // time comparisons on integer µs, so no engine rounding can move a
    // row across the 1-hour boundary; click_id is null ONLY on
    // singleton (unattributed) purchases, so the ORDER BY never has to
    // rank a null against a value and the engines' null-order defaults
    // cannot diverge
    "q232_attribution_audit" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |                  event_type, value FROM events),
        |c AS (SELECT user_id AS c_user, tus AS c_us, event_id AS click_id
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, tus AS p_us, event_id AS purchase_id, value
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, c.click_id, p.p_us, c.c_us, p.value
        |FROM p LEFT JOIN c
        |  ON p.user_id = c.c_user
        | AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 3600000000
        |ORDER BY p.purchase_id, c.click_id""".stripMargin,
    "q193_session_examples_batch" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events),
        |l AS (SELECT *, lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM x),
        |n AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS is_new FROM l),
        |g AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |      FROM n),
        |a AS (SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |             list(event_type ORDER BY tus, event_id) AS seq
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, n_events,
        |       md5(array_to_string(seq[1:len(seq)-1], ' ')) AS prefix_md5,
        |       seq[-1] AS label
        |FROM a WHERE n_events >= 3
        |ORDER BY user_id, n_events, prefix_md5, label""".stripMargin,
    "q81_event_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |l AS (SELECT user_id, event_id, tus,
        |             lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
        |      FROM x),
        |n AS (SELECT user_id, event_id, tus,
        |             CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS is_new
        |      FROM l),
        |sess AS (SELECT user_id, tus,
        |                CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |         FROM n)
        |SELECT user_id, session_id, count(*) AS cnt, min(tus) AS min_us, max(tus) AS max_us
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}

/** Weighted average: sum(price*qty)/sum(qty). Buffer is (numerator, weight);
  * `merge` makes it a proper partial-aggregable UDAF. */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
