package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (getOrCreate: suites run in
  * the single forked test JVM and reuse it). Mirrors the Verify/Bench
  * session config — UTC, ns-as-long parquet reads, small shuffle width. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smallest driver-generated scale factor (TESTDATA.md) — smoke-sized. */
  val Sf0001 = "/root/testdata/sf0.001"
}
