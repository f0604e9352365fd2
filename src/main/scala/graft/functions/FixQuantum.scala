package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** The r13 exact-integer cosine quantum ⌊d·scale/isqrt(n₁·n₂) + ½⌋ as a
  * native codegen'd expression — the IVF family's assignment/objective
  * key (`csim_fx`), arithmetic identical to the decimal(38,0) SQL
  * formulation the DuckDB oracles run (`TrainingData.oHalfUp` /
  * `oIsqrtNest` over HUGEINT), but evaluated in plain longs:
  *
  *  - n₁·n₂ (≤ 2⁷⁶) as a 128-bit (hi, lo) pair via `Math.multiplyHigh`;
  *  - isqrt by double estimate + the ±2 monotone candidate window,
  *    squares compared against (hi, lo) in 128 bits — negative
  *    candidates count unconditionally, so isqrt(0) = 0;
  *  - the half-up division NEVER needs 128-bit arithmetic: Cauchy-
  *    Schwarz gives |d| ≤ t, so with scale split as 2¹⁵·s₂ the
  *    two-stage floor division d·2¹⁵ = q₁t + r₁; r₁·s₂ = q₂t + r₂
  *    keeps every intermediate under 2⁵⁴ and
  *    ⌊d·scale/t + ½⌋ = q₁s₂ + q₂ + [2r₂ ≥ t] exactly, at every sign
  *    (floorDiv/floorMod put the remainders in [0, t)).
  *
  * Why it exists: the Column-level decimal(38,0) formulation is exact
  * but runs ~10 Decimal object operations per (vector, centroid) pair
  * — the r13 bench caught q93's corpus×k hot loop at 3× its r12 cost.
  * This expression is the same integers at long speed, inside
  * whole-stage codegen.
  *
  * Domain: n₁, n₂ ≥ 0 and |d| ≤ isqrt(n₁·n₂) — automatic when d is
  * [[FixDot]]'s dot and n₁/n₂ its self-dots (the only library use);
  * `scale` must be a positive multiple of 2¹⁵ (2²⁰ and 2³⁰ here).
  * Zero vectors (t = 0) define the quantum as 0, the
  * [[graft.ops.TrainingData]] fxQuantum contract. NULL in → NULL out. */
object FixQuantum {

  private def unsignedToDouble(lo: Long): Double =
    (lo >>> 1).toDouble * 2.0 + (lo & 1L)

  /** (c)² ≤ (hi, lo) in unsigned 128-bit, c ≥ 0. */
  private def sqLe(c: Long, hi: Long, lo: Long): Boolean = {
    val sHi = Math.multiplyHigh(c, c)
    val sLo = c * c
    sHi < hi || (sHi == hi && java.lang.Long.compareUnsigned(sLo, lo) <= 0)
  }

  /** The full quantum — static so codegen emits one call. */
  def quantum(d: Long, n1: Long, n2: Long, scale: Long): Long = {
    val hi = Math.multiplyHigh(n1, n2)
    val lo = n1 * n2
    if (hi == 0L && lo == 0L) return 0L // zero vector: cosine DEFINED 0
    val nnD = hi.toDouble * 1.8446744073709552e19 + unsignedToDouble(lo)
    val t0 = math.floor(math.sqrt(nnD)).toLong
    var t = t0 - 2
    var k = -1
    while (k <= 2) {
      val c = t0 + k
      if (c < 0 || sqLe(c, hi, lo)) t += 1
      k += 1
    }
    val s2 = scale >> 15
    val d1 = d << 15
    val q1 = Math.floorDiv(d1, t)
    val r1 = Math.floorMod(d1, t)
    val q2 = Math.floorDiv(r1 * s2, t)
    val r2 = Math.floorMod(r1 * s2, t)
    q1 * s2 + q2 + (if (2 * r2 >= t) 1L else 0L)
  }

  def quantum(d: Column, nsq1: Column, nsq2: Column, scale: Long): Column =
    ColumnBridge.column(FixQuantum(ColumnBridge.expression(d),
      ColumnBridge.expression(nsq1), ColumnBridge.expression(nsq2), scale))
}

case class FixQuantum(first: Expression, second: Expression,
                      third: Expression, scale: Long)
    extends TernaryExpression {

  require(scale > 0 && (scale & ((1L << 15) - 1)) == 0,
    s"fix_quantum scale must be a positive multiple of 2^15, got $scale")

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(first, second, third).map(_.dataType) match {
      case Seq(LongType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fix_quantum requires (bigint, bigint, bigint), got " +
          other.map(_.simpleString).mkString("(", ", ", ")"))
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "fix_quantum"
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(d: Any, n1: Any, n2: Any): Any =
    FixQuantum.quantum(d.asInstanceOf[Long], n1.asInstanceOf[Long],
      n2.asInstanceOf[Long], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, n1, n2) =>
      s"graft.functions.FixQuantum.quantum($d, $n1, $n2, ${scale}L)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): FixQuantum =
    copy(first = newFirst, second = newSecond, third = newThird)
}
