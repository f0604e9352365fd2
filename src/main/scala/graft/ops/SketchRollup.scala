package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Per-day HLL sketches of distinct users — the persisted ingest-time
    * aggregate. One shuffle on day; sketch blobs are ~KB each. */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events
      .withColumn("day", expr("(ts div 1000) div 86400000000"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Rollup WITHOUT touching raw events: union the per-day sketches and
    * estimate. Input is days × KB, not events — constant-ish work no
    * matter how large the raw table was. */
  def totalDistinctUsers(daily: DataFrame): Long =
    daily.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .collect()(0).getLong(0)
}
