package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fixed-point dot product of two float-vector columns as a native
  * codegen'd expression:
  * `Σⱼ ⌊aⱼ·2¹⁶ + ½⌋ · ⌊bⱼ·2¹⁶ + ½⌋` accumulated as a LONG.
  *
  * This is the IVF family's (q93/q152/q156/q157/q160) determinism
  * kernel. [[VecDot]]'s double accumulation is bit-reproducible only
  * when every engine sums in the same order — a 64-term double fold is
  * NOT associative, so an oracle engine that sums a list pairwise (or
  * SIMD-reassociated) lands an ulp away, and anything that floors or
  * ranks on the result can flip (the q160 r10/r11 hash mismatches).
  * Here the only double ops are per-ELEMENT — `(double)float` widening
  * (exact), one multiply by 2¹⁶ (exact exponent shift), one add of ½
  * (exact while |x·2¹⁶| < 2⁵²), one floor (exact) — a fixed chain of
  * individually-correctly-rounded IEEE ops with no reduction, so every
  * engine computes identical per-element integers; the sum itself is
  * INTEGER and therefore order-independent. DuckDB twin:
  * `list_sum([CAST(floor(CAST(a[i] AS DOUBLE)*65536.0+0.5) AS BIGINT) *
  * CAST(floor(CAST(b[i] AS DOUBLE)*65536.0+0.5) AS BIGINT) ...])`.
  *
  * Domain: |element| ≤ 2¹⁰ keeps each quantized value ≤ 2²⁶ and a
  * 64-dim accumulation ≤ 2⁵⁸ — no overflow (the embeddings tables
  * carry |x| < 1). Same NULL contract as [[VecDot]]: NULL array or
  * length mismatch → NULL; empty arrays → 0. */
case class FixDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fix_dot requires (array<float>, array<float>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "fix_dot"
  override def nullable: Boolean = true

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
    var acc = 0L
    var j = 0
    while (j < n) {
      if (checkNulls && (x.isNullAt(j) || y.isNullAt(j))) return null
      val qa = math.floor(x.getFloat(j).toDouble * 65536.0 + 0.5).toLong
      val qb = math.floor(y.getFloat(j).toDouble * 65536.0 + 0.5).toLong
      acc += qa * qb
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      val nullCheck = if (mayHaveNullElements) {
        s"if ($x.isNullAt($j) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }"
      } else ""
      s"""
         |${ev.value} = 0L;
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $nullCheck
         |    long $qa = (long) Math.floor((double) $x.getFloat($j) * 65536.0d + 0.5d);
         |    long $qb = (long) Math.floor((double) $y.getFloat($j) * 65536.0d + 0.5d);
         |    ${ev.value} += $qa * $qb;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixDot =
    copy(left = newLeft, right = newRight)
}

object FixDot {
  /** The fixed-point scale: 2¹⁶ — an exact exponent-shift factor. */
  val Scale: Double = 65536.0

  /** Column-API entry point: `dot(a, b)` (LONG). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FixDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared L2 norm of the 2¹⁶-quantized vector, as the self-dot. */
  def normSq(v: Column): Column = dot(v, v)
}
