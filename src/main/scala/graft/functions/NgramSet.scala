package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** q78's per-document hashed shingle SET as ONE native expression:
  * `NULL` for documents with fewer than 3 tokens (no shingle), else
  * the ascending-sorted distinct `xxhash64` values of every word
  * 3-gram shingle — exactly
  * `sort_array(collect_set(xxhash64(concat_ws(' ', word, w1, w2))))`
  * in the formulation this replaced.
  *
  * That formulation posexploded the corpus into word rows, ran two
  * `lead()` windows (a per-doc sort of every word row) and a
  * collect_set aggregate — one exchange and a window sort for a
  * per-document linear scan. Here the set is a zero-exchange
  * projection feeding q78's localCheckpoint directly. NgramSetSpec
  * pins equality against the replaced formulation (kept alive there
  * as the reference).
  *
  * Equivalence contract: tokens = `split(text, ' ')` KEEPING empties;
  * shingle i = tokens i..i+2 joined with single spaces (`concat_ws`
  * with empty strings); hash = Spark's own [[XXH64]] over the
  * shingle's UTF-8 bytes with the xxhash64 function's fixed seed 42 —
  * the identical value, not a reimplementation. */
case class NgramSet(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"ngram_hash_set requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    NgramSet.compute(input.asInstanceOf[UTF8String])

  /** The kernel may return null (< 3 tokens) even for non-null input,
    * so the generated code re-checks instead of defineCodeGen's
    * non-null contract. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.NgramSet$$.MODULE$$.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramSet =
    copy(child = newChild)
}

object NgramSet {

  /** Per-document kernel (called from generated code). Returns null
    * for documents with fewer than 3 tokens. */
  def compute(text: UTF8String): ArrayData = {
    val tokens = text.toString.split(" ", -1) // limit -1 = Spark split
    if (tokens.length < 3) return null
    val seen = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= tokens.length - 3) {
      val sh = UTF8String.fromString(
        tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2))
      seen.add(XXH64.hashUnsafeBytes(
        sh.getBaseObject, sh.getBaseOffset, sh.numBytes(), 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def grams(text: Column): Column =
    ColumnBridge.column(NgramSet(ColumnBridge.expression(text)))
}
