package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Signed-random-projection LSH bucket of a float-vector column: bit k
  * of the result is `1` iff `dot(vector, planes(k)) > 0`.
  *
  * A native Catalyst expression instead of a composed SQL chain because
  * the chain form (K planes × 64 dims = 1024 `element_at` terms) blows
  * Janino's 64 KB method limit and knocks the whole stage out of
  * codegen. Here `doGenCode` emits two tight loops over a constant
  * `int[][]` — a few hundred bytes of generated Java regardless of K —
  * so the projection stays inside whole-stage codegen.
  *
  * Bit-exactness contract with the DuckDB oracle (which evaluates the
  * expanded `±CAST(e[j] AS DOUBLE)` chain): the accumulator starts at
  * `0.0` and adds `±e(j)` in ascending-j order, the same left-associated
  * IEEE-double sequence as the chain (`0.0 + x ≡ x`; float→double casts
  * and `±1 * x` are exact), so the sign — hence the bucket — is
  * identical in both engines.
  *
  * A vector shorter than a plane, or one with a NULL element, yields
  * NULL — the answer the ORACLE's chain gives (DuckDB's out-of-range
  * `embedding[j]` and NULL elements are both NULL, propagating through
  * sum, comparison, cast, shift, and or), so malformed rows drop out
  * of bucket joins identically in both engines rather than silently
  * bucketing on a prefix or reading a null slot as 0.0. (Spark's own
  * `element_at` chain would instead throw under ANSI mode — a third
  * behavior nobody wants.) */
case class SrpBucket(child: Expression, planes: Array[Array[Int]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_bucket"

  override def nullable: Boolean = true

  /** Null-element scan only emitted when the input type can hold one —
    * zero per-element cost on the containsNull=false embedding scans.
    * (lazy val: the interpreted path calls this per row.) */
  @transient private lazy val mayHaveNullElements: Boolean =
    child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = if (planes.isEmpty) 0 else planes(0).length
    if (arr.numElements() < dims) return null
    if (mayHaveNullElements) {
      var i = 0
      while (i < dims) { if (arr.isNullAt(i)) return null; i += 1 }
    }
    var bucket = 0
    var k = 0
    while (k < planes.length) {
      val p = planes(k)
      var acc = 0.0
      var j = 0
      while (j < p.length) { acc += p(j) * arr.getFloat(j).toDouble; j += 1 }
      if (acc > 0) bucket |= 1 << k
      k += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
    val dims = if (planes.isEmpty) 0 else planes(0).length
    nullSafeCodeGen(ctx, ev, arr => {
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val nullScan = if (mayHaveNullElements) {
        s"""if ($arr.numElements() >= $dims) {
           |  for (int $i = 0; $i < $dims; $i++) {
           |    if ($arr.isNullAt($i)) { ${i}_hasNull = true; break; }
           |  }
           |}""".stripMargin
      } else ""
      s"""
         |${ev.value} = 0;
         |boolean ${i}_hasNull = false;
         |$nullScan
         |if ($arr.numElements() < $dims || ${i}_hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $k = 0; $k < $planesRef.length; $k++) {
         |    int[] $p = $planesRef[$k];
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $p.length; $j++) {
         |      $acc += $p[$j] * (double) $arr.getFloat($j);
         |    }
         |    if ($acc > 0.0) ${ev.value} |= 1 << $k;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

object SrpBucket {
  /** Column-API entry point. */
  def bucket(vec: Column, planes: Array[Array[Int]]): Column =
    ColumnBridge.column(SrpBucket(ColumnBridge.expression(vec), planes))
}
