package graft.sources.rfc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.rfc.MockRfcBackend.MockTable

/** Driver-visible (CORRECTNESS-gated) exercise of the `sap-rfc` DSv2
  * source — the one verification surface RfcSourceSpec's ScalaTest
  * scenarios can't reach.
  *
  * q04 builds a ZNATION fixture from the scale dir's `nation` parquet
  * (25 rows — the collect is a driver-side fixture build, not a data
  * path), registers it in the mock backend, then reads it back through
  * `spark.read.format("sap-rfc")` with two comparison filters and a
  * projection — all of which push into the RFC call's OPTIONS/FIELDS
  * (RfcSourceSpec scenario 5 asserts the plumbing; here the DuckDB
  * oracle checks the end-to-end values against the same parquet).
  * LIKE-shaped filters are not used: the fixture's names all contain
  * `_`, which the builder correctly refuses to push (LIKE wildcard). */
object RfcQueries {

  /** Registers the 25-row ZNATION fixture from the scale dir's `nation`
    * parquet (driver-side fixture build, not a data path). */
  private[sources] def ensureZnation(s: SparkSession, dir: String): Unit = {
    val fixture = graft.ops.T(s, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey").collect()
    val fields = Seq(RfcField("NATIONKEY", "I"), RfcField("NAME", "C"),
      RfcField("REGIONKEY", "I"))
    val rows = fixture.toSeq.map(r =>
      Seq(r.getInt(0).toString, r.getString(1), r.getInt(2).toString))
    MockRfcBackend.register("ZNATION", MockTable(fields, rows))
  }

  def q04RfcSourceScan(s: SparkSession, dir: String): DataFrame = {
    ensureZnation(s, dir)
    s.read.format("sap-rfc").option("table", "ZNATION").load()
      .filter(col("REGIONKEY") >= 2 && col("NATIONKEY") < 20)
      .select(col("NATIONKEY").as("n_nationkey"), col("NAME").as("n_name"),
        col("REGIONKEY").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  /** q174: COUNT(*) answered by the SOURCE — the `sap-rfc` DSv2
    * aggregate pushdown (`RfcScanBuilder.pushAggregation`): in
    * PERMISSIVE mode the server's row count IS the query's count
    * (every WA row, malformed included, yields exactly one output
    * row), so the scan returns one row from `tableRowCount` and never
    * fetches a page. RfcAggPushdownSpec pins the plan (no aggregate
    * node, zero data-page calls) and the mode gates; the DuckDB oracle
    * checks the value against the same parquet the fixture was built
    * from. */
  def q174RfcCountPushdown(s: SparkSession, dir: String): DataFrame = {
    ensureZnation(s, dir)
    s.read.format("sap-rfc").option("table", "ZNATION")
      .option("mode", "PERMISSIVE").load()
      .agg(count(lit(1)).as("n_rows"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q04_rfc_source_scan" -> q04RfcSourceScan _,
    "q174_rfc_count_pushdown" -> q174RfcCountPushdown _,
  )

  val oracle: Map[String, String] = Map(
    "q04_rfc_source_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey >= 2 AND n_nationkey < 20
        |ORDER BY n_nationkey""".stripMargin,
    "q174_rfc_count_pushdown" ->
      "SELECT count(*) AS n_rows FROM nation",
  )
}
