package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level substring overlap — the exact-substring complement to the
  * set-similarity dedup family (q72 MinHash, q77/q88 SimHash, q78 PPJoin).
  *
  * Near-dup detectors score whole documents; substring-level dedup finds
  * VERBATIM REUSE — boilerplate headers, quoted passages, licence blocks —
  * that document-level similarity dilutes below threshold the moment the
  * surrounding text differs. Training-data pipelines run both: document
  * near-dup to drop clones, substring overlap to measure (and optionally
  * excise) repeated spans a model would memorize. North-star ops (prov
  * `ns`, SURVEY §2.3); no reference-behavior citation applies.
  *
  * Both queries share one window table: fixed-width 50-char windows at
  * stride 10, keyed by md5 so every exchange carries a 32-byte digest,
  * never document text (the q105 hash-first discipline). Stride keeps the
  * blowup at len/10 rows per doc — the standard cost/recall dial (stride 1
  * = exact suffix-array recall, stride w = disjoint chunks); any ≥59-char
  * verbatim span is guaranteed to contribute at least one shared window
  * regardless of alignment (w + stride − 1).
  */
object Corpus {

  /** The shared window table: (doc_id, source, k = md5 of the 50-char
    * window at 1-based positions 1, 11, 21, …). Docs shorter than one
    * window carry no rows — same contract as the oracle's WHERE. The
    * explode is a codegen'd `transform(sequence(...))` projection: one
    * pass over the text, no per-position substring re-scan on the driver
    * side of the plan, and the raw text never leaves the scan stage. */
  private def charWindows(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .filter(length(col("text")) >= 50)
      .select(col("doc_id"), col("source"),
        explode(expr(
          "transform(sequence(1, length(text) - 49, 10), " +
            "i -> md5(substring(text, i, 50)))")).as("k"))

  /** q117: exact substring-duplication profile — per document, how many
    * of its windows occur verbatim in ANY other document. The per-doc
    * `n_dup_win / n_win` is the span-level memorization-risk signal a
    * curation pipeline thresholds on (docs that are MOSTLY shared text
    * get dropped even when no single whole-document near-dup exists).
    *
    * Shape: window table → groupBy(k) marking keys seen in >1 distinct
    * doc → equi-join back on k → per-doc counts. The dup side arrives at
    * the join already hash-partitioned on k from its aggregate, so only
    * the (re-computed) probe side shuffles — same
    * recompute-beats-materialize call as q104, and at deployment scale
    * the window table would be a persisted intermediate anyway. A window
    * repeated across millions of docs is ONE dup-side row (the aggregate
    * collapses it), so hot boilerplate cannot skew the join's build side;
    * the probe side's copies of that key spread across partitions by
    * (k, doc) and AQE's skew split covers the residue. */
  def q117SubstringDedup(s: SparkSession, dir: String): DataFrame = {
    val w = charWindows(s, dir)
    val dup = w.groupBy("k")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("k"), lit(1L).as("is_dup"))
    w.join(dup, Seq("k"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_win"),
        coalesce(sum(col("is_dup")), lit(0L)).as("n_dup_win"))
      .orderBy("doc_id")
  }

  /** q118: cross-source contamination matrix — for every source pair,
    * the number of DISTINCT 50-char windows both contain. This is the
    * corpus-composition audit run before mixing sources into a training
    * set: a high cell means two "independent" sources share provenance
    * (mirrors, scrapes of the same site) and their mixing weights
    * double-count it. Exact-text overlap at sf0.01 is zero BETWEEN
    * sources (exact dups are all intra-source here), which is precisely
    * why the audit works at window granularity.
    *
    * Shape: distinct (k, source) FIRST — a window repeated a million
    * times inside one source collapses to one row before the self-join,
    * so per-key fanout is bounded by the SOURCE CARDINALITY (tens), not
    * document counts; then one equi-join on k and a pair count. */
  def q118SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val ws = charWindows(s, dir).select(col("k"), col("source")).distinct()
    ws.toDF("k", "src_a")
      .join(ws.toDF("k", "src_b"), "k")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_windows"))
      .orderBy("src_a", "src_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_substring_dedup" -> q117SubstringDedup _,
    "q118_source_overlap" -> q118SourceOverlap _,
  )

  /** The shared window CTE, verbatim in both oracles (DuckDB's
    * generate_series is end-inclusive, as Spark's sequence is). */
  private val windowsCte: String =
    """w AS (
      |  SELECT doc_id, source, md5(substr(text, CAST(i AS INT), 50)) AS k
      |  FROM documents,
      |       LATERAL (SELECT unnest(generate_series(1, length(text) - 49, 10)) AS i) t
      |  WHERE length(text) >= 50)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q117_substring_dedup" ->
      s"""WITH $windowsCte,
        |dup AS (SELECT k FROM w GROUP BY k HAVING count(DISTINCT doc_id) > 1)
        |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_win,
        |       CAST(count(dup.k) AS BIGINT) AS n_dup_win
        |FROM w LEFT JOIN dup ON w.k = dup.k
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q118_source_overlap" ->
      s"""WITH $windowsCte,
        |ws AS (SELECT DISTINCT k, source FROM w)
        |SELECT a.source AS src_a, b.source AS src_b,
        |       CAST(count(*) AS BIGINT) AS shared_windows
        |FROM ws a JOIN ws b ON a.k = b.k AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
