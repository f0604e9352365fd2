package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `|A ∩ B|` of two ASCENDING-SORTED DISTINCT long-array columns as one
  * codegen'd sorted-merge — the q78/q244 verify kernel (r18, guide §4).
  *
  * Replaces `size(array_intersect(sa, sb))`, which builds an
  * OpenHashSet AND materializes the intersection array per candidate
  * pair only to take its length — the dominant allocation in the
  * PPJoin verify stage. The merge is O(|A|+|B|) with zero allocation,
  * and equals `size(array_intersect(..))` exactly WHEN both inputs are
  * sorted ascending with distinct, non-null elements — the documented
  * [[NgramSet]] output contract (its `sort_array(collect_set(..))`
  * semantics), which IntersectCountSpec re-pins against
  * `array_intersect` on randomized fixtures. The analysis-time type
  * check REJECTS arrays that may contain nulls, so a misuse fails
  * loudly instead of merging garbage. NULL array → NULL (the
  * BinaryExpression contract); result is INT, matching `size(..)`. */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "intersect_count requires (array<bigint> containsNull=false, " +
          s"array<bigint> containsNull=false), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count"
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |${ev.value} = 0;
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { ${ev.value}++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Column-API entry point: `count(a, b)` (INT). */
  def count(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
