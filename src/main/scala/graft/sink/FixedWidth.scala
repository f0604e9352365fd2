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

  // ---- q288: IDoc-style multi-segment file + control reconciliation --

  /** The IDoc-ish segment layouts: the record TYPE rides position 1 and
    * dispatches the rest of the line — the multi-record-type flat file
    * SAP interfaces actually exchange (IDoc/EDI): a control segment per
    * document declaring its own payload (line count + total), then the
    * data segments. */
  private[sink] val CtrlLayout = Seq(
    FwField("okey", 2, 12, "bigint"),
    FwField("decl_n", 14, 4, "bigint"),
    FwField("decl_c2", 18, 14, "bigint"))
  private[sink] val DataLayout = Seq(
    FwField("okey", 2, 12, "bigint"),
    FwField("ln", 14, 4, "bigint"),
    FwField("qty", 18, 4, "bigint"),
    FwField("c2", 22, 14, "bigint"))

  /** Transit corruption tickets (md5 over the order key): residue 0 of
    * 20 drops the document's LAST data segment (count mismatch — and
    * the sum goes with it), residue 1 corrupts the FIRST segment's
    * cents by +100 (sum-only mismatch). Disjoint residues, both ~5%. */
  private[sink] def idocTick(k: String) =
    s"cast(conv(substring(md5(concat('idoc:', cast($k as string))), " +
      "1, 12), 16, 10) as bigint) % 20"

  /** Writes the interleaved control+data text file once per
    * (JVM, dataset): data at the q264 (order, line-number) grain,
    * controls declaring the PRE-corruption truth, corruption applied
    * in transit. */
  private[graft] def ensureIdocFile(s: SparkSession, dir: String): String =
    ScratchExport.once(s"idoc:$dir") {
      val out = ScratchExport.scratchDir("graft-idoc-")
      val grain = T(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_linenumber").as("ln"),
          expr("cast(l_quantity as bigint)").as("q0"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("c0"))
        .groupBy("okey", "ln")
        .agg(sum("q0").as("qty"), sum("c0").as("c2"))
      val ctrl = grain.groupBy("okey")
        .agg(count(lit(1)).as("decl_n"), sum("c2").as("decl_c2"))
        .select(concat(lit("C"),
          lpad(col("okey").cast("string"), 12, "0"),
          lpad(col("decl_n").cast("string"), 4, "0"),
          lpad(col("decl_c2").cast("string"), 14, "0")).as("value"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("okey")
      val data = grain
        .withColumn("mx", max("ln").over(w))
        .withColumn("mn", min("ln").over(w))
        .withColumn("t", expr(idocTick("okey")))
        // transit corruption: drop the last segment / bump the first
        .filter(!(col("t") === 0 && col("ln") === col("mx")))
        .withColumn("c2x",
          when(col("t") === 1 && col("ln") === col("mn"), col("c2") + 100)
            .otherwise(col("c2")))
        .select(concat(lit("D"),
          lpad(col("okey").cast("string"), 12, "0"),
          lpad(col("ln").cast("string"), 4, "0"),
          lpad(col("qty").cast("string"), 4, "0"),
          lpad(col("c2x").cast("string"), 14, "0")).as("value"))
      ctrl.unionByName(data).write.mode("overwrite").text(out)
      out
    }

  /** q288: IDoc-style parse + control-total reconciliation — the SAP
    * interface-monitoring report (WE02/WE05's "status 51" view): a
    * multi-record-type positional file is parsed by DISPATCHING on the
    * segment type (two positional parses over one text scan — never a
    * parser per file pass), each document's parsed payload is
    * reconciled against what its OWN control segment declared, and the
    * report rolls up by verdict (ok / count_mismatch / sum_mismatch —
    * count takes priority: a dropped segment moves the sum too).
    * Corruption is derived in transit ([[idocTick]]); controls carry
    * the pre-corruption truth, so both mismatch classes genuinely fire
    * and every declared total is independently recomputable by the
    * raw-table oracle.
    *
    * Scale shape: one splittable text scan, two codegen'd positional
    * projections (filters on the type byte), one (document) aggregate
    * of the data side, one broadcast-able join to controls, one
    * verdict-sized rollup. */
  def q288IdocReconcile(s: SparkSession, dir: String): DataFrame = {
    val lines = s.read.text(ensureIdocFile(s, dir))
    val ctrl = parse(lines.filter(expr("substring(value, 1, 1) = 'C'")),
      CtrlLayout)
    val data = parse(lines.filter(expr("substring(value, 1, 1) = 'D'")),
      DataLayout)
      .groupBy("okey")
      .agg(count(lit(1)).as("got_n"), sum("c2").as("got_c2"))
    ctrl.join(data, Seq("okey"), "left")
      .withColumn("got_n", coalesce(col("got_n"), lit(0L)))
      .withColumn("got_c2", coalesce(col("got_c2"), lit(0L)))
      .withColumn("verdict",
        when(col("got_n") =!= col("decl_n"), "count_mismatch")
          .when(col("got_c2") =!= col("decl_c2"), "sum_mismatch")
          .otherwise("ok"))
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_docs"),
        sum("decl_n").as("decl_lines"), sum("got_n").as("parsed_lines"),
        sum("decl_c2").as("decl_c2"), sum("got_c2").as("parsed_c2"))
      .orderBy("verdict")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q241_fixed_width_roundtrip" -> q241FixedWidthRoundtrip _,
    "q288_idoc_reconcile" -> q288IdocReconcile _,
  )

  /** The oracle reads the RAW parquet orders and re-applies the layout's
    * lossy edges (6-char priority truncation, 10-char date slice). */
  val oracle: Map[String, String] = Map(
    // q288: the oracle re-derives the interface semantics from the RAW
    // tables — declared truth per document, the same transit tickets,
    // the same verdict priority — so a hash match proves the text
    // round trip AND the reconciliation arithmetic at once
    "q288_idoc_reconcile" ->
      """WITH grain AS (SELECT l_orderkey AS okey, l_linenumber AS ln,
        |                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS c2
        |               FROM lineitem GROUP BY 1, 2),
        |decl AS (SELECT okey, count(*) AS decl_n, sum(c2) AS decl_c2
        |         FROM grain GROUP BY 1),
        |t AS (SELECT okey, ln, c2,
        |        max(ln) OVER (PARTITION BY okey) AS mx,
        |        min(ln) OVER (PARTITION BY okey) AS mn,
        |        ('0x' || substr(md5('idoc:' || okey::VARCHAR), 1, 12))::BIGINT % 20 AS tk
        |      FROM grain),
        |got AS (SELECT okey, count(*) AS got_n,
        |          sum(CASE WHEN tk = 1 AND ln = mn THEN c2 + 100 ELSE c2 END) AS got_c2
        |        FROM t WHERE NOT (tk = 0 AND ln = mx) GROUP BY 1),
        |j AS (SELECT d.okey, d.decl_n, d.decl_c2,
        |        COALESCE(g.got_n, 0) AS got_n, COALESCE(g.got_c2, 0) AS got_c2
        |      FROM decl d LEFT JOIN got g ON d.okey = g.okey)
        |SELECT CASE WHEN got_n <> decl_n THEN 'count_mismatch'
        |            WHEN got_c2 <> decl_c2 THEN 'sum_mismatch'
        |            ELSE 'ok' END AS verdict,
        |       count(*) AS n_docs,
        |       CAST(sum(decl_n) AS BIGINT) AS decl_lines,
        |       CAST(sum(got_n) AS BIGINT) AS parsed_lines,
        |       CAST(sum(decl_c2) AS BIGINT) AS decl_c2,
        |       CAST(sum(got_c2) AS BIGINT) AS parsed_c2
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
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
