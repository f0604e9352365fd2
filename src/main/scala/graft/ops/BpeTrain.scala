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
  * DuckDB oracle (r11 — q162 moved OFF the no-oracle list): the
  * stateful greedy scan has a data-parallel equivalent that plain SQL
  * CAN express. Greedy left-to-right non-overlapping (a, b) merging
  * consumes, within every maximal RUN of consecutive pair positions,
  * exactly the odd-ranked ones — and runs longer than one position
  * exist only when a = b (position j and j+1 both matching forces
  * syms[j+1] = b = a), so for a ≠ b every occurrence merges and for
  * a = b alternate ones do. The oracle computes pair positions per
  * word, groups consecutive runs (j − row_number), keeps odd ranks,
  * and rebuilds each word with a list comprehension — no recursion,
  * no per-position CTE. Equivalence to the fold: after a merge the
  * accumulator's last element is `ab`, which can never equal `a`
  * (b non-empty), and a literal multi-char symbol `ab` in the input
  * is not a pair position in either formulation. Every w/b CTE is
  * MATERIALIZED — DuckDB inlines CTEs by default, and each iteration
  * references its predecessor several times (inlining made the chain
  * exponential). BpeTrainSpec additionally pins the trainer against an
  * independent driver-side reference plus hand fixtures.
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
    * a subword tokenizer would ship. Oracle-checked (r11): the DuckDB
    * twin in [[oracle]] replays the identical greedy training via the
    * run-parity data-parallel equivalence (materialized per-iteration
    * CTEs — see the object doc). */
  def q162BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainMerges(s, dir, Merges)
      .toDF("rank", "left", "right", "freq")
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_bpe_train" -> q162BpeTrain _)

  /** One DuckDB training iteration (see the object doc's equivalence
    * argument): pair-frequency argmax (b$i), greedy-taken positions via
    * run-parity (e$i/t$i), rebuild (w$i). */
  private def oracleIter(i: Int): String = {
    val prev = s"w${i - 1}"
    s"""p$i AS (SELECT l, r, SUM(n) AS freq FROM (
       |   SELECT unnest([{'l': syms[j], 'r': syms[j+1]} for j in range(1, len(syms))], recursive := true), n
       |   FROM $prev WHERE len(syms) >= 2) GROUP BY 1, 2),
       |b$i AS MATERIALIZED (SELECT l, r, freq FROM p$i ORDER BY freq DESC, l, r LIMIT 1),
       |e$i AS (SELECT w.wid, j,
       |        j - row_number() OVER (PARTITION BY w.wid ORDER BY j) AS grp
       |        FROM $prev w CROSS JOIN b$i b,
       |             unnest([j for j in range(1, len(w.syms)) if w.syms[j] = b.l AND w.syms[j+1] = b.r]) t(j)),
       |t$i AS (SELECT wid, list(j ORDER BY j) AS tk FROM
       |        (SELECT wid, j, row_number() OVER (PARTITION BY wid, grp ORDER BY j) AS rr FROM e$i)
       |        WHERE rr % 2 = 1 GROUP BY wid),
       |w$i AS MATERIALIZED (SELECT w.wid, w.n,
       |        CASE WHEN t.tk IS NULL THEN w.syms ELSE
       |          list_filter([CASE WHEN list_contains(t.tk, j) THEN b.l || b.r
       |                            WHEN list_contains(t.tk, j - 1) THEN NULL
       |                            ELSE w.syms[j] END for j in range(1, len(w.syms) + 1)],
       |                      x -> x IS NOT NULL) END AS syms
       |        FROM $prev w CROSS JOIN b$i b LEFT JOIN t$i t ON w.wid = t.wid)"""
      .stripMargin
  }

  private[ops] def mergeOracleSql(merges: Int): String = {
    val blocks = (1 to merges).map(oracleIter).mkString(",\n")
    val finals = (1 to merges).map(i =>
      s"""SELECT CAST($i AS INTEGER) AS rank, l AS "left", r AS "right", CAST(freq AS BIGINT) AS freq FROM b$i""")
      .mkString(" UNION ALL ")
    s"""WITH
       |wc AS (SELECT word, count(*) AS n FROM (
       |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word FROM documents) GROUP BY word),
       |w0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY word) AS wid, string_split(word, '') AS syms, n FROM wc),
       |$blocks
       |SELECT * FROM ($finals) ORDER BY rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q162_bpe_train" -> mergeOracleSql(Merges))
}
