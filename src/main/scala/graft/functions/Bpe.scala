package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword (BPE-style) tokenization as native codegen'd expressions.
  *
  * Every token-denominated operator (q84 counts, q92 packing, q112
  * chunking, q150 budgets) previously used the whitespace contract;
  * real training budgets are set in SUBWORD tokens, which run 1.2–2×
  * the whitespace count depending on language. `bpe_count` /
  * `bpe_tokens` supply that unit. (No reference analogue — the
  * reference at /root/reference/pyrfc_read_table/pyrfc_read_table.py
  * has no text operators at all; this is north-star surface.)
  *
  * Tokenizer contract (deterministic, cross-engine):
  *  - greedy longest-match from the left against a FIXED merged-vocab
  *    table ([[Bpe.vocab]]) of space-prefixed and bare word pieces —
  *    the GPT-2-style "leading space belongs to the token" convention;
  *  - a position with no vocab match consumes exactly ONE character
  *    (byte-level fallback);
  *  - token ids: vocab hit = [[Bpe.VocabBase]] + vocab index, fallback
  *    = the UTF-16 code unit (< VocabBase, collision-free). The corpus
  *    contract is ASCII (DataContractSpec pins it), where code unit =
  *    codepoint; supplementary characters would tokenize per surrogate
  *    half and are outside the pinned contract.
  *
  * Greedy longest-match was chosen over merge-rank order precisely so
  * the DuckDB oracle can mirror it exactly: one recursive CTE whose
  * step is `pos += max(len(tok)) over matching vocab entries, else 1`
  * ([[Bpe.countCteSql]] generates it from the same vocab constant).
  * BpeSpec pins the Scala kernel against a direct reference
  * implementation plus hand-computed examples.
  */
object Bpe {

  /** Word pieces: common corpus words merge whole; longer words
    * deliberately split (cust+omer, vec+tor, wind+ow, str+eam,
    * fil+ter, col+umn) so subword counts genuinely differ from
    * whitespace counts. Each piece enters the vocab twice: with the
    * GPT-2-style leading space and bare (document-initial). */
  private val pieces: Seq[String] = Seq(
    "the", "a", "row", "key", "big", "agg", "data", "join", "hash",
    "scan", "sort", "fast", "slow", "line", "part", "small", "table",
    "value", "query", "merge", "batch", "order", "group", "spark", "dup",
    "cust", "omer", "vec", "tor", "wind", "ow", "str", "eam", "fil",
    "ter", "col", "umn")

  val vocab: IndexedSeq[String] =
    pieces.flatMap(p => Seq(" " + p, p)).toIndexedSeq

  /** Vocab ids start above every possible fallback id (fallback = a
    * UTF-16 code unit, < 65536). */
  val VocabBase: Int = 65536

  private val maxLen: Int = vocab.map(_.length).max

  private val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (v, i) => m.put(v, i) }
    m
  }

  /** Longest vocab match at `pos`, or -1. Sets `matchLen(0)`. */
  private def longestMatch(t: String, pos: Int, matchLen: Array[Int]): Int = {
    var l = math.min(maxLen, t.length - pos)
    while (l >= 1) {
      val v = ids.get(t.substring(pos, pos + l))
      if (v != null) { matchLen(0) = l; return v.intValue() }
      l -= 1
    }
    -1
  }

  /** Per-row count kernel (called from generated code). */
  def countTokens(text: UTF8String): Long = {
    val t = text.toString
    val ml = new Array[Int](1)
    var pos = 0
    var cnt = 0L
    while (pos < t.length) {
      val id = longestMatch(t, pos, ml)
      pos += (if (id >= 0) ml(0) else 1)
      cnt += 1
    }
    cnt
  }

  /** Per-row token-id kernel (called from generated code). Empty
    * string yields an empty array, never null. */
  def tokenIds(text: UTF8String): ArrayData = {
    val t = text.toString
    val buf = scala.collection.mutable.ArrayBuilder.make[Int]
    buf.sizeHint(t.length / 4 + 4)
    val ml = new Array[Int](1)
    var pos = 0
    while (pos < t.length) {
      val id = longestMatch(t, pos, ml)
      if (id >= 0) { buf += VocabBase + id; pos += ml(0) }
      else { buf += t.charAt(pos).toInt; pos += 1 }
    }
    new GenericArrayData(buf.result())
  }

  /** Column-API entry points. */
  def count(text: Column): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(text)))
  def tokens(text: Column): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text)))

  /** `(' the'),('the'),…` — the vocab as a DuckDB VALUES list, so the
    * oracle tokenizes with the SAME table this kernel embeds. */
  def vocabValuesSql: String =
    vocab.map(v => "('" + v.replace("'", "''") + "')").mkString(",")

  /** DuckDB CTE fragment computing `(doc_id, btok)` = per-document
    * greedy subword counts over `documents.text` — the oracle twin of
    * [[countTokens]]. Prepend `WITH RECURSIVE `. */
  def countCteSql: String =
    s"""bpe_vocab(tok) AS (VALUES $vocabValuesSql),
       |bpe_walk AS (
       |  SELECT doc_id, text AS t, 1 AS pos, 0 AS cnt FROM documents
       |  UNION ALL
       |  SELECT doc_id, t,
       |         pos + coalesce((SELECT max(len(v.tok)) FROM bpe_vocab v
       |                         WHERE substr(t, pos, len(v.tok)) = v.tok), 1),
       |         cnt + 1
       |  FROM bpe_walk WHERE pos <= len(t)
       |),
       |bpe_cnt AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS btok
       |            FROM bpe_walk GROUP BY doc_id)""".stripMargin
}

/** `bpe_count(text)`: the document's subword token count under the
  * [[Bpe]] contract. Null only for null input. */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bpe_count requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe$$.MODULE$$.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** `bpe_tokens(text)`: the document's subword token ids under the
  * [[Bpe]] contract (`array<int>`; empty input → empty array). */
case class BpeTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bpe_tokens requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override protected def nullSafeEval(input: Any): Any =
    Bpe.tokenIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe$$.MODULE$$.tokenIds($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
