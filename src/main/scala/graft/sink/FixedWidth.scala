package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** q241: the FIXED-WIDTH leg of the storage-format story — the
  * position-delimited flat-file layout mainframe and ERP extract jobs
  * still emit (SAP's own SE16/background-job downloads are
  * column-aligned text; the reference's WA rows are the
  * DELIMITER-joined cousin, parsed by q02 — this is the positional
  * sibling, completing delimited/CSV/JSONL/parquet/ORC/Avro).
  *
  * The library piece is [[FixedWidth.parse]]: a layout-spec-driven
  * positional parser (substring → trim → cast per field) that compiles
  * to a codegen'd projection — one scan, no UDF, no regex; the same
  * explicit-schema contract as q161/q189 (a layout spec IS the schema;
  * inference over positional text is meaningless). Round-trip
  * semantics the oracle must reproduce from the RAW table: zero-padded
  * numerics re-parse exactly, timestamps ride their first 10 rendered
  * chars, and over-width strings TRUNCATE at the field boundary
  * (`o_orderpriority` → 6 chars, so '1-URGENT' lands as '1-URGE' —
  * truncation is the lossy edge every fixed-width consumer must own,
  * made visible in the output rather than hidden).
  *
  * Scale: the write repartitions like any text export (q153's sharded
  * layout applies unchanged); the read is line-per-row text — splittable,
  * parallel, but with NO statistics or pushdown (the q189 argument:
  * fixed-width is an INGEST leg; convert to parquet for the storage
  * leg). Parse cost is O(line width) per row inside whole-stage
  * codegen. */
object FixedWidth {

  /** One positional field: 1-based start, width, and the SQL type the
    * trimmed slice casts to. */
  final case class FwField(name: String, start: Int, len: Int, typ: String)

  /** The orders extract layout — 53-char lines, six fields. */
  private[sink] val OrdersLayout = Seq(
    FwField("okey", 1, 12, "bigint"),
    FwField("ckey", 13, 12, "bigint"),
    FwField("status", 25, 1, "string"),
    FwField("price_c2", 26, 12, "bigint"),
    FwField("date_s", 38, 10, "string"),
    FwField("prio_t", 48, 6, "string"))

  /** Positional parse: substring → trim → cast per layout field, one
    * codegen'd projection over the `value` line column. */
  def parse(lines: DataFrame, layout: Seq[FwField]): DataFrame =
    lines.select(layout.map(f =>
      expr(s"cast(trim(substring(value, ${f.start}, ${f.len})) as ${f.typ})")
        .as(f.name)): _*)

  /** Writes the orders fixed-width extract once per (JVM, dataset):
    * zero-padded numerics, first-10-chars timestamp, 6-char truncated
    * priority — the layout [[OrdersLayout]] reads back. */
  private[graft] def ensureFixedWidthOrders(s: SparkSession,
                                            dir: String): String =
    ScratchExport.once(s"fixedwidth:$dir") {
      val out = ScratchExport.scratchDir("graft-fw-")
      T(s, dir, "orders")
        .select(concat(
          lpad(col("o_orderkey").cast("string"), 12, "0"),
          lpad(col("o_custkey").cast("string"), 12, "0"),
          col("o_orderstatus"),
          lpad(expr("cast(round(o_totalprice * 100) as bigint)")
            .cast("string"), 12, "0"),
          substring(col("o_orderdate").cast("string"), 1, 10),
          rpad(col("o_orderpriority"), 6, " ")).as("value"))
        .write.mode("overwrite").text(out)
      out
    }

  /** q241: selective aggregate over the re-parsed fixed-width copy —
    * key sums prove the zero-pad numeric round trip, date min/max prove
    * the positional timestamp slice, and the distinct TRUNCATED
    * priority count carries the boundary-truncation semantics. The
    * DuckDB oracle recomputes all of it from the raw parquet orders, so
    * a hash match proves the positional text round trip neither lost,
    * duplicated, sheared, nor re-typed a row. */
  def q241FixedWidthRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = ensureFixedWidthOrders(s, dir)
    parse(s.read.text(path), OrdersLayout)
      .filter(col("status") =!= "P")
      .groupBy("status")
      .agg(count(lit(1)).as("n_orders"),
        sum("okey").as("sum_keys"),
        sum("price_c2").as("sum_price_c2"),
        countDistinct("prio_t").as("n_prios"),
        min("date_s").as("first_date"),
        max("date_s").as("last_date"))
      .orderBy("status")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q241_fixed_width_roundtrip" -> q241FixedWidthRoundtrip _,
  )

  /** The oracle reads the RAW parquet orders and re-applies the layout's
    * lossy edges (6-char priority truncation, 10-char date slice). */
  val oracle: Map[String, String] = Map(
    "q241_fixed_width_roundtrip" ->
      """SELECT o_orderstatus AS status, count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2,
        |       CAST(count(DISTINCT trim(substr(o_orderpriority, 1, 6))) AS BIGINT) AS n_prios,
        |       min(substr(CAST(o_orderdate AS VARCHAR), 1, 10)) AS first_date,
        |       max(substr(CAST(o_orderdate AS VARCHAR), 1, 10)) AS last_date
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
