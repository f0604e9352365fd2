package graft

import org.apache.spark.sql.SparkSession

/** One place for session construction so Verify/Bench/tests agree on the
  * engine contract:
  *
  *  - `spark.sql.shuffle.partitions` = cpu count — local mode; a real
  *    cluster deployment sizes this to ~2-3× total executor cores (or
  *    leaves it to AQE coalescing, which stays enabled here);
  *  - UTC session timezone (determinism contract, SURVEY.md §2.3);
  *  - `nanosAsLong` — kept so a TIMESTAMP(NANOS) events.parquet (the
  *    pre-round-8 testdata encoding, which the vectorized reader
  *    otherwise rejects) loads as an ns `LongType`; `graft.ops.T.tus`
  *    dispatches on the loaded physical type, so both the ns-long and
  *    the current `timestamp[us]` encodings work unchanged;
  *  - AQE left at defaults: runtime coalescing and skew-join splitting
  *    are part of the 100 TB story, not something to disable locally.
  */
object Sessions {
  def local(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
