package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge-rule TRAINING — the other half of the subword story:
  * [[graft.functions.Bpe]] tokenizes under a FIXED vocab; real
  * pipelines first LEARN that vocab from the corpus. Classic
  * byte-pair-encoding (Sennrich et al. 2016, and the GPT-2 recipe):
  * start from characters, repeatedly merge the most frequent adjacent
  * symbol pair, each merge becoming one vocab entry.
  *
  * Scale shape — the standard BPE trick makes this cheap at 100 TB:
  * the corpus is touched ONCE, by the word-frequency aggregate
  * (vocabulary-bounded output, the q74 wordcount shape). Every
  * training iteration then runs over the DISTINCT-WORD table weighted
  * by counts — pair explode → partial+final sum keyed on the pair →
  * a 1-row deterministic argmax to the driver — so per-iteration cost
  * is |vocabulary|, not |corpus|, and the driver sees one row per
  * merge. The merge application is a stateful left-to-right fold via
  * the `aggregate` higher-order function (greedy non-overlapping —
  * a merged symbol can never re-match its own left constituent, since
  * `a == a+b` is impossible for non-empty `b`), executed
  * distributedly over the word table; `localCheckpoint` truncates the
  * per-iteration lineage exactly like the q100/q106 fixpoint loops.
  *
  * No DuckDB oracle BY DESIGN: one training iteration rewrites symbol
  * sequences under the learned merge (stateful greedy scan), which no
  * SQL engine expresses without a per-position recursive CTE per
  * iteration; BpeTrainSpec pins the whole merge table against an
  * independent driver-side reference trainer plus hand-computed
  * fixtures (the q114/q116/q154 evidence pattern).
  */
object BpeTrain {

  private[ops] val Merges = 8

  /** The (word, n) frequency table — the only corpus-wide pass. */
  private def wordCounts(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(explode(expr("filter(split(text, ' '), x -> x != '')"))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** One greedy left-to-right merge application over a symbol array:
    * scan position i — if (s[i], s[i+1]) == (a, b), emit a||b and skip
    * both. As a fold: merge with the accumulator's LAST element; the
    * produced symbol a||b can never equal `a` again (b non-empty), so
    * overlapping re-merges are impossible — exactly the non-overlap
    * scan semantics. */
  private def applyMerge(symsCol: String, a: String, b: String) = {
    // backslashes FIRST, then quotes: a learned symbol containing `\`
    // (inside the pinned <257 codepoint contract) would otherwise
    // escape the literal's closing quote and break the parse
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val qa = q(a)
    val qb = q(b)
    expr(
      s"""aggregate($symsCol, CAST(array() AS array<string>),
         |  (acc, x) -> CASE
         |    WHEN size(acc) > 0 AND element_at(acc, -1) = '$qa'
         |         AND x = '$qb'
         |    THEN concat(slice(acc, 1, size(acc) - 1),
         |                array(concat('$qa', '$qb')))
         |    ELSE concat(acc, array(x)) END)""".stripMargin)
  }

  /** Learned merge table: (rank, left, right, freq) — freq is the
    * weighted adjacent-pair count at the time of the merge. */
  private[ops] def trainMerges(s: SparkSession, dir: String,
                               merges: Int): Seq[(Int, String, String, Long)] =
    trainMergesFrom(wordCounts(s, dir), merges)

  /** The training loop over an arbitrary (word, n) frequency table —
    * BpeTrainSpec drives fixtures through it. */
  private[ops] def trainMergesFrom(wc: DataFrame,
                                   merges: Int): Seq[(Int, String, String, Long)] = {
    var words = wc
      .select(expr("split(word, '')").as("syms"), col("n"))
      .localCheckpoint(true)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to merges) {
      val best = words
        .select(explode(expr(
          "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1), (l, r) -> struct(l, r))"))
          .as("p"), col("n"))
        .select(col("p.l").as("l"), col("p.r").as("r"), col("n"))
        .groupBy("l", "r").agg(sum("n").as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1)
        .collect() // exactly one row — the argmax merge
      if (best.nonEmpty) {
        val (a, b, f) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((rank, a, b, f))
        words = words
          .select(applyMerge("syms", a, b).as("syms"), col("n"))
          .localCheckpoint(true)
      }
    }
    out.result()
  }

  /** q162: the learned merge table over `documents` — the vocabulary
    * a subword tokenizer would ship. Rows-only (no oracle by design,
    * see object doc). */
  def q162BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainMerges(s, dir, Merges)
      .toDF("rank", "left", "right", "freq")
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_bpe_train" -> q162BpeTrain _)
}
