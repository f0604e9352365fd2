package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** q173: the ORC leg of the storage-format story — Spark's other
  * first-class columnar container (parquet everywhere else in this
  * library; a real lakehouse ingests from both). The lineitem fact is
  * written ONCE per (JVM, dataset) as zlib ORC, and the query reads it
  * back through Spark's native ORC scan with a selective predicate and
  * a narrow projection — the point being that BOTH survive the format
  * change: `.explain` shows the quantity/returnflag predicates in the
  * scan's `PushedFilters` (ORC row-group stride elimination at scale)
  * and a `ReadSchema` of exactly the four referenced columns (ORC is
  * columnar — unreferenced columns are never decoded). OrcSourceSpec
  * pins both plan properties plus byte-identical row content across
  * the round trip.
  *
  * Correctness: the DuckDB oracle computes the same aggregate from the
  * RAW parquet table, so a hash match proves the ORC rewrite preserved
  * every row and the pushed filters dropped none in range. Money sums
  * in exact integer cents (2-decimal prices by generator contract). */
object OrcQueries {

  /** dataset dir → ORC lineitem location — write-once + scratch
    * cleanup ride [[ScratchExport]] (r12: migrated off the global-lock
    * TrieMap copy alongside CSV/Avro). */
  private[graft] def ensureOrcLineitem(s: SparkSession,
                                       dir: String): String =
    ScratchExport.once(s"orc:$dir") {
      val out = ScratchExport.scratchDir("graft-orc-")
      T(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_linestatus",
          "l_shipdate")
        .write.mode("overwrite").option("compression", "zlib").orc(out)
      out
    }

  /** q173: selective aggregate over the ORC copy — high-quantity
    * returned lineitems per linestatus. */
  def q173OrcRoundtrip(s: SparkSession, dir: String): DataFrame =
    s.read.orc(ensureOrcLineitem(s, dir))
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30)
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
          .as("sum_price_c2"),
        sum(expr("cast(l_quantity as bigint)")).as("sum_qty"))
      .orderBy("l_linestatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q173_orc_roundtrip" -> q173OrcRoundtrip _,
  )

  /** The oracle reads the RAW parquet lineitem — equality proves the
    * ORC rewrite neither lost nor duplicated rows. */
  val oracle: Map[String, String] = Map(
    "q173_orc_roundtrip" ->
      """SELECT l_linestatus, count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
