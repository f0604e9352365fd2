package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float-vector columns as a native codegen'd
  * expression: `Σⱼ (double) a(j) · (double) b(j)`, accumulated in
  * ascending-j order.
  *
  * This replaces the HOF form
  * `aggregate(zip_with(a, b, (x,y) -> ...), 0d, (acc,v) -> acc + v)` in
  * the similarity/ANN hot loops (q73/q79/q86/q93 rerank and the q93
  * assignment pass): lambda expressions evaluate interpreted — a
  * closure call per element — while this loop stays inside whole-stage
  * codegen (see the repo's measured HOF gaps in spark-perf-gotchas and
  * the SrpBucket scaladoc for the same pattern over one vector).
  *
  * Bit-exactness contract with the DuckDB oracle (`list_sum([a[i]*b[i]
  * ...])` / the HOF chain): the accumulator starts at 0.0 and adds the
  * exact float→double products in ascending index order — the same
  * left-associated IEEE sequence — so replacing the HOF form cannot
  * perturb a single bit.
  *
  * NULL contract (mirrors the Spark HOF chain this replaced): NULL
  * input array → NULL; length mismatch → NULL (`zip_with` pads the
  * shorter side with NULL, poisoning the fold); NULL element → NULL.
  * Empty arrays → 0.0 (the fold's seed). NOTE for oracle authors:
  * DuckDB's `list_sum` SKIPS NULL elements (list_sum([1.0, NULL]) =
  * 1.0) — a DuckDB twin over a nullable product list does NOT match
  * this contract; every current oracle avoids it because the embedding
  * columns carry containsNull=false (for which the null branch below
  * is not even emitted). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires (array<float>, array<float>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true

  /** The per-element null scan only exists when an input can actually
    * hold a null element — for the containsNull=false embedding columns
    * (every declared query) the hot loop carries no per-element branch.
    * (lazy val: the interpreted path calls this per row.) */
  @transient private lazy val mayHaveNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val checkNulls = mayHaveNullElements
    var acc = 0.0
    var j = 0
    while (j < n) {
      if (checkNulls && (x.isNullAt(j) || y.isNullAt(j))) return null
      acc += x.getFloat(j).toDouble * y.getFloat(j).toDouble
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val nullCheck = if (mayHaveNullElements) {
        s"if ($x.isNullAt($j) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }"
      } else ""
      s"""
         |${ev.value} = 0.0;
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $nullCheck
         |    ${ev.value} += (double) $x.getFloat($j) * (double) $y.getFloat($j);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-API entry point: `dot(a, b)`. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared L2 norm as the self-dot — bit-identical to the HOF fold
    * `aggregate(v, 0d, (acc, x) -> acc + x·x)` (same ascending order). */
  def normSq(v: Column): Column = dot(v, v)
}
