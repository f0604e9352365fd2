package graft.sources

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.T

/** JSONL ingest with corrupt-record routing — the lingua-franca
  * container of LLM corpora (one JSON document per line), read through
  * Spark's native json source with an EXPLICIT schema and PERMISSIVE
  * mode, malformed lines routed to a `_corrupt` column instead of
  * killing the job: the file-level analogue of the reference's WA
  * err-routing (rows that fail the arity check go to the err bucket,
  * /root/reference/pyrfc_read_table/pyrfc_read_table.py:185-197 —
  * here lines that fail the JSON grammar go to the err bucket).
  *
  * The fixture is a deterministic round-trip of the `documents` table
  * itself (the q153 pattern — write once per JVM, oracle recomputes
  * expectations from the raw parquet): every document serializes to
  * one `to_json` line, and docs with `doc_id % 37 == 0` are TRUNCATED
  * to their first 12 characters — a provably unterminated JSON object,
  * so the corrupt set is exactly known.
  *
  * Scale shape: JSONL is line-splittable, so the read parallelizes by
  * byte ranges like any text source; the explicit schema avoids the
  * double-scan schema inference would cost on 100 TB (inference reads
  * every byte once before the real scan); PERMISSIVE keeps one bad
  * line from failing a 1000-executor job. The write is one narrow
  * projection; nothing shuffles until the final small aggregate.
  */
object JsonlIngest {

  /** Read-back schema — explicit, so ingest never pays inference. */
  private[sources] val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  /** dataset dir → written JSONL location (write-once per JVM). */
  private val written = TrieMap[String, String]()

  /** Serializes `documents` to JSONL with the deterministic corruption
    * and returns the directory (one write per JVM per dataset). */
  private[sources] def ensureJsonlExport(s: SparkSession,
                                         dir: String): String =
    synchronized {
      written.getOrElseUpdate(dir, {
        val out = Files.createTempDirectory("graft-jsonl-").toString
        T(s, dir, "documents")
          .select(col("doc_id"),
            to_json(struct(col("doc_id"), col("text"), col("lang"),
              col("source"))).as("js"))
          .select(when(col("doc_id") % 37 === 0,
              substring(col("js"), 1, 12))
            .otherwise(col("js")).as("value"))
          .write.mode("overwrite").text(out)
        out
      })
    }

  /** The parsed read-back frame: good rows carry the document fields,
    * corrupt lines carry ONLY `_corrupt` (PERMISSIVE nulls the rest). */
  private[graft] def readBack(s: SparkSession, dir: String): DataFrame =
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(ensureJsonlExport(s, dir))

  /** q161: the ingest health report — parsed-vs-corrupt routing counts
    * per language ('-' for the corrupt bucket, which has no parsed
    * fields), proving the corrupt set is exactly the injected one and
    * every surviving line round-tripped. One pass, one small aggregate
    * (a plan referencing ONLY the corrupt column is disallowed by
    * Spark's json source, so status and lang derive together). */
  def q161JsonlIngest(s: SparkSession, dir: String): DataFrame =
    readBack(s, dir)
      .select(
        when(col("_corrupt").isNull, lit("ok")).otherwise(lit("err"))
          .as("status"),
        when(col("_corrupt").isNull, col("lang")).otherwise(lit("-"))
          .as("lang"))
      .groupBy("status", "lang").agg(count(lit(1)).as("n"))
      .orderBy("status", "lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q161_jsonl_ingest" -> q161JsonlIngest _)

  /** The oracle recomputes the routing from the raw parquet: the
    * corrupt bucket is exactly the truncated doc_ids, everything else
    * parses back with its language intact. */
  val oracle: Map[String, String] = Map(
    "q161_jsonl_ingest" ->
      """SELECT 'err' AS status, '-' AS lang, count(*) AS n
        |FROM documents WHERE doc_id % 37 = 0
        |UNION ALL
        |SELECT 'ok', lang, count(*) FROM documents
        |WHERE doc_id % 37 <> 0 GROUP BY lang
        |ORDER BY status, lang""".stripMargin)
}
