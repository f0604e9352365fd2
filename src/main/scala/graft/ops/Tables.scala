package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading for the driver testdata (TESTDATA.md).
  *
  * `events.parquet` carries `timestamp[ns]` (TIMESTAMP(NANOS)) which Spark's
  * parquet reader rejects by default; sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (done once in the
  * Verify/Bench/test session builders — NOT per table load, which would be
  * racy under concurrent queries) so `ts` arrives as a LongType ns epoch.
  *
  * Event-time contract: DuckDB reads TIMESTAMP(NANOS) truncated to µs,
  * and the testdata carries genuine sub-µs precision (verified — raw ns
  * values are not µs-aligned). Every declared query therefore quantizes
  * `ts` to µs (`ts div 1000`) BEFORE any boundary comparison, window
  * ordering, or bucketing — the precision both engines share exactly.
  * Comparing raw ns on the Spark side would silently diverge whenever two
  * events share a µs or a boundary falls inside one. `ts >= 0`
  * (post-1970) is asserted by DataContractSpec; `div`-vs-floor-division
  * divergence for negative epochs is therefore out of contract.
  */
object T {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

/** Exact cross-engine arithmetic shared by the declared queries. */
object Exact {
  /** Exact half-up 4-dp rounding of the rational `num/den` in integer
    * arithmetic: `(2·num·10⁴ + den) div (2·den)` basis points, then one
    * `/10⁴`. Spark's `round(double, 4)` half-ups the double's shortest
    * decimal representation while DuckDB rounds the binary value, so
    * they disagree whenever a small exact rational lands on a 4-decimal
    * half-way point (0.59825, 0.72125 — bit q83 at sf0.1). Used by
    * q78/q83/q96; the oracle SQL applies the same integer formula. */
  def r4(num: String, den: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"""cast((2 * cast($num as bigint) * 10000 + cast($den as bigint))
         |     div (2 * cast($den as bigint)) as double) / 10000.0d"""
        .stripMargin)
}
