package graft.sink

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** q177: parquet SCHEMA EVOLUTION — the add-a-column-without-rewriting-
  * history contract a 100 TB lake depends on: batch 1 of the corpus was
  * written before anyone computed a quality signal; batch 2 ships with
  * a `quality` column. Nobody rewrites batch 1 (at 100 TB, rewriting
  * history to add a column is the anti-pattern); the reader asks for
  * `mergeSchema` and Spark unions the file footers at PLANNING time —
  * old files surface the new column as NULL, no data movement.
  *
  * The query aggregates across both batches, separating "docs profiled"
  * (`count(quality)` skips the nulls) from "docs present" — the exact
  * semantics the null backfill must preserve. The DuckDB oracle
  * recomputes both batches' contributions from the RAW documents table,
  * so a hash match proves the split write + merged read lost no row and
  * invented no quality value. SchemaEvolutionSpec pins the merged
  * schema, the null backfill on batch-1 rows, and that a non-merged
  * read of batch 2 alone still sees the column (footer truth, not
  * session state). */
object SchemaEvolution {

  /** dataset dir → evolved-layout location (write-once per JVM; the
    * PartitionedQueries/OrcQueries protocol). Batch split is the
    * deterministic `doc_id % 2`. */
  private val written = TrieMap[String, String]()

  private[graft] def ensureEvolvedDocs(s: SparkSession,
                                       dir: String): String =
    written.synchronized {
      written.getOrElseUpdate(dir, {
        val out = Files.createTempDirectory("graft-evolve-").toString
        val docs = T(s, dir, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .select("doc_id", "lang", "n_chars")
          .write.mode("overwrite").parquet(s"$out/batch=1")
        docs.filter(col("doc_id") % 2 =!= 0)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            // the evolved column: the exact-integer quality proxy
            (col("n_chars") * 10).as("quality"))
          .write.mode("overwrite").parquet(s"$out/batch=2")
        out
      })
    }

  /** q177: per-language rollup across both schema generations. */
  def q177SchemaEvolution(s: SparkSession, dir: String): DataFrame =
    s.read.option("mergeSchema", "true")
      .parquet(ensureEvolvedDocs(s, dir))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(col("quality")).as("n_profiled"),
        sum(col("quality")).as("sum_quality"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_schema_evolution" -> q177SchemaEvolution _,
  )

  /** The oracle recomputes both generations from the raw table: every
    * doc counts, only odd doc_ids carry quality. */
  val oracle: Map[String, String] = Map(
    "q177_schema_evolution" ->
      """SELECT lang, count(*) AS n_docs,
        |       count(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS n_profiled,
        |       CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN n_chars * 10 END) AS BIGINT) AS sum_quality,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
