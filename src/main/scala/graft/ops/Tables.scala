package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading for the driver testdata (TESTDATA.md).
  *
  * `events.parquet` carries `timestamp[ns]` (TIMESTAMP(NANOS)) which Spark's
  * parquet reader rejects by default; `nanosAsLong` reads it as a LongType
  * nanosecond epoch. We embrace that: event-time arithmetic is done on exact
  * ns longs end-to-end (DuckDB oracle side uses `epoch_ns(ts)`), so there is
  * no us-vs-ns truncation drift between engines.
  */
object T {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
