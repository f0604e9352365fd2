package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** q85's winnowing fingerprint summary as ONE native expression:
  * base-257 polynomial hashes of every character 5-gram, the
  * winnowing minimum over each run of 4 consecutive grams, and the
  * per-document rollup `(n_fp = distinct selected fingerprints,
  * min_fp = smallest)` — `NULL` for documents under 8 characters
  * (< 4 five-grams ⇒ no full winnowing window), mirroring the SQL
  * form's length pre-filter.
  *
  * This replaces the q85 pipeline `posexplode(split(text, '')) → two
  * per-doc windows (4 lead()s to build the gram hash, a rowsBetween
  * min) → groupBy(doc_id)`: the explode turned every CHARACTER into a
  * row (a corpus-char-sized window sort per scan — by far q85's cost)
  * for what is a per-document linear scan. Here the whole computation
  * is a zero-exchange projection; WinnowFpSpec pins equality against
  * the replaced formulation, which it keeps alive as the reference.
  *
  * Equivalence contract with the SQL form (and the DuckDB oracle):
  * `a(i)` is the CODEPOINT of character i (`ascii()` semantics); the
  * gram hash is a(i)·257⁴ + a(i+1)·257³ + a(i+2)·257² + a(i+3)·257 +
  * a(i+4). The q85 injectivity contract (DataContractSpec) pins the
  * corpus to codepoints < 257, under which the hash is exact and
  * fits a long (< 257⁵). Iteration here is by Unicode code point, so
  * the expression agrees with `split(text, '')`+`ascii()` for any BMP
  * input, not just the pinned ASCII. (NOT for supplementary
  * characters: Spark's `ascii()` returns the first UTF-16 code UNIT —
  * a surrogate half — where this iteration sees the whole code point;
  * both are outside the pinned < 257 contract anyway.) */
case class WinnowFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow_fp requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType, nullable = false),
    StructField("min_fp", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFp.compute(input.asInstanceOf[UTF8String])

  /** The kernel may return null (short doc) even for non-null input,
    * so the generated code re-checks instead of using defineCodeGen's
    * non-null contract. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WinnowFp$$.MODULE$$.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {

  /** Per-document kernel (called from generated code). Returns null
    * for documents with fewer than 8 code points. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    // code points, ascii()-compatible
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < 8) return null
    val m = n - 4 // five-grams at 0..m-1
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      h(i) = cps(i) * 4362470401L + cps(i + 1) * 16974593L +
        cps(i + 2) * 66049L + cps(i + 3) * 257L + cps(i + 4)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    var minFp = Long.MaxValue
    var pos = 0
    while (pos <= m - 4) { // full 4-gram winnowing windows only
      var mn = h(pos)
      var k = 1
      while (k < 4) { if (h(pos + k) < mn) mn = h(pos + k); k += 1 }
      seen.add(mn)
      if (mn < minFp) minFp = mn
      pos += 1
    }
    new GenericInternalRow(Array[Any](seen.size.toLong, minFp))
  }

  /** Column-API entry point. */
  def winnow(text: Column): Column =
    ColumnBridge.column(WinnowFp(ColumnBridge.expression(text)))
}
