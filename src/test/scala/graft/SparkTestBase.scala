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

  /** The md5-ticket derivation the fixtures share (the Spark side's
    * `conv(substring(md5(s), 1, hexDigits), 16, 10)`) — ONE test-side
    * implementation so a ticket-scheme change cannot leave a spec
    * validating against a stale copy. */
  def md5Long(s: String, hexDigits: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(hexDigits), 16)
  }

  /** Scoped conf override restoring the PRIOR value (or unsetting, for
    * confs whose default is null — e.g.
    * spark.sql.adaptive.autoBroadcastJoinThreshold) — never a hardcoded
    * "restore": the session is shared across every suite in the forked
    * JVM, so a spec that force-restores a literal leaks its assumption
    * into unrelated tests. Shared here because three suites
    * (BuiltinRuntimeFilterSpec, DppSpec, AffinitySpec) were growing
    * divergent copies. */
  def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val old = pairs.map { case (k, _) =>
      k -> (try Option(conf.get(k)) catch { case _: Exception => None })
    }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
