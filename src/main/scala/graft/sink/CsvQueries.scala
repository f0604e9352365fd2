package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.T

/** q189: the CSV leg of the storage-format story — the interchange
  * format every upstream system still emits (parquet/ORC/JSONL cover
  * the columnar and line-JSON legs; the reference's own WA rows are
  * delimiter-joined text, so delimited-text round-trip fidelity is
  * squarely in this engine's domain). The orders fact is written ONCE
  * per (JVM, dataset) as headered, quoted CSV and read back with an
  * EXPLICIT schema — never inference, which costs a second full scan
  * at 100 TB and can silently re-type a column from a lucky sample
  * (the q161 JSONL argument, applied to CSV).
  *
  * What the round trip must survive: double round-trip fidelity
  * (Spark writes shortest-round-trip decimal text, so re-parsed
  * doubles are bit-identical), timestamp round-trip through the ISO
  * form, and QUOTED EMBEDDED DELIMITERS — `o_note` is synthesized
  * with a literal comma precisely so a quoting bug would shear every
  * row's arity. CsvSourceSpec pins all three plus the explicit-schema
  * contract; the DuckDB oracle aggregates the RAW parquet, so a hash
  * match proves the text round trip neither lost, duplicated, nor
  * re-typed a row. CSV pushes no predicates (row-major text has no
  * statistics — the documented cost of the format, why it is the
  * ingest leg and parquet the storage leg), but column PARSE pruning
  * still applies: unreferenced fields are never converted. */
object CsvQueries {

  /** The explicit read schema is DERIVED from the source frame at
    * write time, never hard-coded: the driver's testdata has already
    * regenerated `o_orderdate` across physical encodings (TIMESTAMP →
    * TIMESTAMP_NTZ at round 8 — the `T.events` dispatch exists for
    * exactly this), and a hard-coded TimestampType would silently
    * re-type every value the moment the parquet side is NTZ.
    * Write-once + scratch cleanup ride [[ScratchExport]]. */
  private[graft] def ensureCsvOrders(s: SparkSession,
                                     dir: String): (String, StructType) =
    ScratchExport.once(s"csv:$dir") {
      val out = ScratchExport.scratchDir("graft-csv-")
      val src = T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          // embedded comma by construction — the quoting canary
          concat(col("o_orderpriority"), lit(", "),
            col("o_orderstatus")).as("o_note"))
      src.write.mode("overwrite").option("header", "true").csv(out)
      (out, src.schema)
    }

  /** q189: selective aggregate over the CSV copy — money in exact
    * integer cents (2-decimal prices by generator contract), so the
    * comparison never rides float summation order; the `o_note`
    * length sum proves the quoted commas survived intact. */
  def q189CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val (path, schema) = ensureCsvOrders(s, dir)
    s.read.schema(schema).option("header", "true").csv(path)
      .filter(col("o_orderdate") >=
        lit("1995-01-01").cast(schema("o_orderdate").dataType) &&
        col("o_orderstatus") =!= "P")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"),
        sum(length(col("o_note")).cast("long")).as("note_chars"),
        min("o_orderdate").cast("string").as("first_date"),
        max("o_orderdate").cast("string").as("last_date"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q189_csv_roundtrip" -> q189CsvRoundtrip _,
  )

  /** The oracle reads the RAW parquet orders — equality proves the CSV
    * text round trip preserved every row, type, and value. */
  val oracle: Map[String, String] = Map(
    "q189_csv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2,
        |       CAST(sum(length(o_orderpriority || ', ' || o_orderstatus)) AS BIGINT) AS note_chars,
        |       CAST(min(o_orderdate) AS VARCHAR) AS first_date,
        |       CAST(max(o_orderdate) AS VARCHAR) AS last_date
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderstatus <> 'P'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
