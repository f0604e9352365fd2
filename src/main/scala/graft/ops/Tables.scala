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
