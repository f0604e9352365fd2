package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftbridge.ColumnBridge

/** `deflate_len(text)`: the DEFLATE-compressed byte length of the
  * text's UTF-8 encoding at a FIXED level (6, zlib framing) — the
  * kernel behind the compression-ratio quality signal (q168): highly
  * compressible text is repetitive boilerplate in exactly the way
  * Gopher's repetition ratios flag, but measured holistically by the
  * same machinery that would store the corpus. The level is pinned so
  * the value is a deterministic function of the text for a given
  * zlib; no SQL engine exposes a deflate length, so q168 is
  * spec-verified (CompressSignalSpec recomputes through
  * `java.util.zip` independently), not DuckDB-checked.
  *
  * Cost: one pass over the bytes per row, no allocation beyond the
  * scratch buffer — a per-row scalar like `md5`, fully parallel at
  * scan width. */
object DeflateLen {

  // one native Deflater per task thread, reset() between rows — the
  // standard hot-path pattern: constructing/ending a Deflater is a
  // native malloc/free pair that would otherwise run per ROW and
  // dominate small documents
  private val localDeflater =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6, false)
    }
  private val localBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Compressed length of `t`'s bytes, level 6, zlib-wrapped. */
  def deflatedLen(t: UTF8String): Long = {
    val bytes = t.getBytes
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = localBuf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def len(text: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(text)))
}

case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"deflate_len requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateLen$$.MODULE$$.deflatedLen($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLen = copy(child = newChild)
}
