package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.WaParser

/** q02/q03 — the reference's delimited-parse + arity-validation + error
  * routing semantics (`pyrfc_read_table.py:135-149`), re-created on testdata
  * by first *building* WA strings from lineitem columns with the reference's
  * backtick delimiter (`pyrfc_read_table.py:32`). */
object ParseRoute {

  /** q02: well-formed WA rows parse back to their fields (trimmed). */
  def q02RfcParseValidate(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "lineitem")
      .select(
        col("l_orderkey").cast("string").as("k"),
        col("l_returnflag").as("f"),
        col("l_linestatus").as("st"))
      .distinct()
      .select(concat_ws(WaParser.DefaultDelimiter, col("k"), col("f"), col("st")).as("wa"))
    WaParser
      .goodRows(base, "wa", Seq("l_orderkey", "l_returnflag", "l_linestatus"))
      .orderBy("l_orderkey", "l_returnflag", "l_linestatus")
  }

  /** q03: rows with an embedded delimiter inside a value over-split and are
    * routed to the error branch; returns `(l_orderkey, arity)`. */
  def q03ErrRouting(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "lineitem")
      .filter(col("l_orderkey") % 97 === 0)
      .select(
        col("l_orderkey"),
        concat_ws(WaParser.DefaultDelimiter,
          col("l_orderkey").cast("string"),
          concat(col("l_returnflag"), lit(WaParser.DefaultDelimiter)),
          col("l_linestatus")).as("wa"))
    WaParser.errRows(base, "wa", nFields = 3)
      .select(col("l_orderkey"), col("arity"))
      .distinct()
      .orderBy("l_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q02_rfc_parse_validate" -> q02RfcParseValidate _,
    "q03_err_routing" -> q03ErrRouting _,
  )

  val oracle: Map[String, String] = Map(
    "q02_rfc_parse_validate" ->
      """SELECT trim(parts[1]) AS l_orderkey, trim(parts[2]) AS l_returnflag, trim(parts[3]) AS l_linestatus
        |FROM (SELECT string_split(wa, '`') AS parts
        |      FROM (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) || '`' || l_returnflag || '`' || l_linestatus AS wa
        |            FROM lineitem))
        |WHERE len(parts) = 3 ORDER BY 1, 2, 3""".stripMargin,
    "q03_err_routing" ->
      """SELECT l_orderkey, arity FROM (
        |  SELECT DISTINCT l_orderkey,
        |         CAST(len(string_split(CAST(l_orderkey AS VARCHAR) || '`' || l_returnflag || '``' || l_linestatus, '`')) AS INTEGER) AS arity
        |  FROM lineitem WHERE l_orderkey % 97 = 0)
        |WHERE arity <> 3 ORDER BY l_orderkey""".stripMargin,
  )
}
