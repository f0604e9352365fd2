package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The q72 MinHash signature (8 × 60-bit minima over word-3-gram
  * shingles) as ONE native expression: `NULL` for documents with fewer
  * than 3 tokens (no shingle), else `array<long>[8]` where element k =
  * min over the document's distinct shingles of the first 60 bits of
  * `md5(k + ":" + shingle)`.
  *
  * This replaces the corpus-scan pipeline `posexplode(split) → two
  * lead() windows (per-doc sort of every WORD row) → distinct-shingle
  * dictionary (corpus-wide distinct + join back on the shingle STRING)
  * → groupBy(doc_id).agg(8 mins)`: three exchanges of word/shingle-
  * sized row sets for what is a per-document linear scan. Here the
  * signature is a zero-exchange projection; banding explodes only the
  * FOUR band structs per doc. MinhashSigSpec pins equality against the
  * replaced formulation (kept alive there as the reference).
  *
  * Equivalence contract with the replaced SQL and the DuckDB oracle
  * (`minhashBandsCtes`):
  *  - tokens = `split(text, ' ')` KEEPING empties (consecutive /
  *    leading / trailing separators produce empty tokens that join
  *    into shingles exactly as `concat_ws` did);
  *  - shingle i = tokens i, i+1, i+2 joined with single spaces;
  *  - per-document DISTINCT shingles (the oracle's `list_distinct`;
  *    min over a multiset equals min over its set, so this matches
  *    the replaced per-occurrence form too);
  *  - hash k = first 15 hex chars of `md5(s"$k:" + shingle)` read as
  *    an unsigned integer = the digest's first 8 bytes as a big-endian
  *    unsigned long, logically shifted right by 4 (60 bits — exact in
  *    a long, the same value `conv(substring(hex,1,15),16,10)` and
  *    DuckDB's `('0x' || substring(md5(..),1,15))::BIGINT` produce). */
case class MinhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[UTF8String])

  /** The kernel may return null (< 3 tokens) even for non-null input,
    * so the generated code re-checks instead of defineCodeGen's
    * non-null contract. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSig$$.MODULE$$.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `"0:"` … `"7:"` as UTF-8 bytes, hoisted out of the hot loop. */
  private val prefixes: Array[Array[Byte]] =
    (0 until 8).map(k => s"$k:".getBytes("UTF-8")).toArray

  /** Per-document kernel (called from generated code). Returns null
    * for documents with fewer than 3 tokens. */
  def compute(text: UTF8String): ArrayData = {
    // limit -1 = Spark's split(text, ' '): trailing empties KEPT
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < 3) return null
    val mins = Array.fill(8)(Long.MaxValue)
    val md = md5.get()
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i <= tokens.length - 3) {
      val sh = tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2)
      if (seen.add(sh)) {
        val shBytes = sh.getBytes("UTF-8")
        var k = 0
        while (k < 8) {
          md.reset()
          md.update(prefixes(k))
          md.update(shBytes)
          val d = md.digest()
          var be = 0L
          var j = 0
          while (j < 8) { be = (be << 8) | (d(j) & 0xffL); j += 1 }
          val v = be >>> 4 // first 15 hex chars = top 60 bits
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-API entry point. */
  def sig(text: Column): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(text)))
}
