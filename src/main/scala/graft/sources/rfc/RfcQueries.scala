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

  def q04RfcSourceScan(s: SparkSession, dir: String): DataFrame = {
    val fixture = graft.ops.T(s, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey").collect()
    val fields = Seq(RfcField("NATIONKEY", "I"), RfcField("NAME", "C"),
      RfcField("REGIONKEY", "I"))
    val rows = fixture.toSeq.map(r =>
      Seq(r.getInt(0).toString, r.getString(1), r.getInt(2).toString))
    MockRfcBackend.register("ZNATION", MockTable(fields, rows))
    s.read.format("sap-rfc").option("table", "ZNATION").load()
      .filter(col("REGIONKEY") >= 2 && col("NATIONKEY") < 20)
      .select(col("NATIONKEY").as("n_nationkey"), col("NAME").as("n_name"),
        col("REGIONKEY").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q04_rfc_source_scan" -> q04RfcSourceScan _,
  )

  val oracle: Map[String, String] = Map(
    "q04_rfc_source_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey >= 2 AND n_nationkey < 20
        |ORDER BY n_nationkey""".stripMargin,
  )
}
