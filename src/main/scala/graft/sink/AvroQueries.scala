package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** q192: the Avro leg of the storage-format story — the row-major
  * container format streaming/ingest stacks emit (Kafka → data lake
  * landings are overwhelmingly Avro), completing the matrix next to
  * parquet (q01...), ORC (q173), CSV (q189) and JSONL (q161). The
  * orders fact is written ONCE per (JVM, dataset) through the
  * [[graft.sources.avro.AvroTableProvider]] DSv2 sink and read back
  * through its scan with a narrow projection — the plan's ReadSchema
  * shows only the referenced fields, which the connector pushes down
  * as an Avro READER schema (unreferenced fields are never decoded;
  * row-major bytes are still read — the documented cost of the format
  * and the reason parquet is the storage leg).
  *
  * Schema discipline: the write derives its schema from the source
  * frame and the read INFERS from the container header (never
  * hard-coded — the q189 lesson: the driver's testdata has already
  * re-typed timestamp columns across regenerations, and the Avro
  * logical-type mapping carries whichever flavor the parquet side
  * has). The DuckDB oracle aggregates the RAW parquet orders, so a
  * hash match proves the Avro rewrite neither lost, duplicated, nor
  * re-typed a row. Money sums in exact integer cents. */
object AvroQueries {

  /** Write-once + scratch cleanup ride [[ScratchExport]]. */
  private[graft] def ensureAvroOrders(s: SparkSession, dir: String): String =
    ScratchExport.once(s"avro:$dir") {
      val out = ScratchExport.scratchDir("graft-avro-")
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
        .write.format("graft-avro").mode("overwrite").save(out)
      out
    }

  /** q192: selective aggregate over the Avro copy — urgent-priority
    * orders per status with exact-cents money and the latest order
    * year (exercises the timestamp logical-type round trip). */
  def q192AvroRoundtrip(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-avro").load(ensureAvroOrders(s, dir))
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"),
        max(year(col("o_orderdate"))).as("max_year"))
      .orderBy("o_orderstatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q192_avro_roundtrip" -> q192AvroRoundtrip _,
  )

  /** The oracle reads the RAW parquet orders — equality proves the
    * Avro rewrite preserved every row and value. */
  val oracle: Map[String, String] = Map(
    "q192_avro_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2,
        |       CAST(max(year(o_orderdate)) AS INTEGER) AS max_year
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
