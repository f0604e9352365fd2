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
  * Assumes non-null array elements (embedding vectors); a vector shorter
  * than a plane is dotted over its own length. */
case class SrpBucket(child: Expression, planes: Array[Array[Int]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var bucket = 0
    var k = 0
    while (k < planes.length) {
      val p = planes(k)
      val n = math.min(p.length, arr.numElements())
      var acc = 0.0
      var j = 0
      while (j < n) { acc += p(j) * arr.getFloat(j).toDouble; j += 1 }
      if (acc > 0) bucket |= 1 << k
      k += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      s"""
         |${ev.value} = 0;
         |for (int $k = 0; $k < $planesRef.length; $k++) {
         |  int[] $p = $planesRef[$k];
         |  int $n = java.lang.Math.min($p.length, $arr.numElements());
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $p[$j] * (double) $arr.getFloat($j);
         |  }
         |  if ($acc > 0.0) ${ev.value} |= 1 << $k;
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
