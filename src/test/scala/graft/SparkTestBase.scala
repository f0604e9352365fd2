package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (getOrCreate: suites run in
  * the single forked test JVM and reuse it). Same [[Sessions]] config as
  * Verify/Bench — UTC, ns-as-long parquet reads, small shuffle width. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = Sessions.local("4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smallest driver-generated scale factor (TESTDATA.md) — smoke-sized. */
  val Sf0001 = "/root/testdata/sf0.001"
}
