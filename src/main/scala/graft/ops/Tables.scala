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
  * Event-time contract: DuckDB reads TIMESTAMP(NANOS) truncated to µs, so
  * every boundary comparison/bucketing in the declared queries quantizes to
  * µs (`ts div 1000`) first — the precision both engines share exactly.
  * Data with genuine sub-µs precision would make the two engines see
  * different µs values only if a boundary falls strictly between two ns
  * inside the same µs, which the quantization rules out. `ts >= 0`
  * (post-1970) is asserted by the test suite; `div`-vs-floor-division
  * divergence for negative epochs is therefore out of contract.
  */
object T {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
