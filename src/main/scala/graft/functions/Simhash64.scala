package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a space-separated document as ONE native
  * expression: split on single spaces (empty tokens skipped), MD5 each
  * token occurrence, vote ±1 per bit over the digest's first 64 bits
  * (big-endian), emit the 64-char '0'/'1' fingerprint (bit b = '1' iff
  * its vote sum is > 0; a token-less document is all '0's).
  *
  * This replaces the q77/q88/q109 SQL pipeline
  * `explode(filter(split(text,' '),…)) → md5 → 4× conv(substring) →
  * groupBy(doc_id).agg(64 conditional sums) → join back`: the explode
  * multiplied every document into per-token rows and the 64-column
  * aggregate shuffled them back per doc — at corpus scale that is a
  * token-count-sized exchange for what is a per-ROW computation. Here
  * the whole fingerprint happens inside the projection (one call per
  * document, no explode, no exchange), and the expression stays inside
  * whole-stage codegen via a static call (the loop body is branch-free
  * per token; a per-element lambda chain would evaluate interpreted —
  * the VecDot/SrpBucket rationale).
  *
  * Bit-exactness contract with the SQL form it replaced AND the DuckDB
  * oracle (`[md5(x) for x in …]` + nibble bit-tests): Spark's
  * `md5(string)` hashes the UTF-8 bytes; `conv(substring(hex, 4j+1, 4),
  * 16, 10)` reads hex chars [4j, 4j+4) = digest bytes [2j, 2j+2)
  * big-endian, and bit i of the 64-bit word is digest byte i/8, bit
  * 7−(i%8) — exactly the loop below. Votes sum over token OCCURRENCES
  * (not distinct tokens), ties (vote 0, incl. zero tokens) emit '0' —
  * both matching the old left-join `when(b > 0)` semantics.
  *
  * NULL contract: NULL text → NULL (UnaryExpression's default
  * null-intolerant behavior, same as the old pipeline where a NULL doc
  * produced no exploded rows and the left join yielded the all-'0'
  * row — NOTE: that one case differs, NULL text is now NULL, not
  * '0'×64; the documents contract (DataContractSpec) has no NULL
  * texts, and a NULL-text corpus row would be a generator bug better
  * surfaced than fingerprinted). */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    Simhash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Simhash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object Simhash64 {

  /** One digest instance per thread: MessageDigest is stateful and
    * codegen calls this from every task thread. */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The per-document kernel (called from generated code — must stay
    * public and static-shaped). Operates directly on the UTF-8 bytes:
    * token boundaries are single 0x20 bytes (the `split(text, ' ')`
    * contract; multi-byte UTF-8 never contains 0x20, so this is exact
    * for any input, not just the ASCII the testdata carries). */
  def compute(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    val md = md5.get()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (i > start) {
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          var b = 0
          while (b < 64) {
            if (((d(b >> 3) >> (7 - (b & 7))) & 1) == 1) votes(b) += 1
            else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var b = 0
    while (b < 64) {
      out(b) = if (votes(b) > 0) '1'.toByte else '0'.toByte
      b += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column-API entry point. */
  def simhash(text: Column): Column =
    ColumnBridge.column(Simhash64(ColumnBridge.expression(text)))
}
