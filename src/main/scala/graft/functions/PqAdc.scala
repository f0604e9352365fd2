package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Asymmetric PQ distance of a float QUERY vector to an ENCODED
  * candidate: `Σ_m d²(quant(query_sub_m), codebook[m][codes[m]])` in
  * the 2¹⁶ fixed-point integer grid — the q195 IVFPQ rerank kernel.
  *
  * This is the expression form of q194's table lookup: a real store
  * precomputes the query's M×K distance table once and does O(M)
  * lookups per candidate; as a codegen'd per-pair expression the
  * direct evaluation costs O(M·subDim) = one pass over the query's 64
  * floats — the same arithmetic as a dot product, with the candidate
  * side touching ONLY its codes (the floats are never re-read, which
  * is the PQ contract). The codebook rides as a constant
  * `long[M][K][subDim]` ([[PqCodes]]' inlining pattern).
  *
  * All-integer (squared-L2 needs no sqrt), so the value is exact in
  * any engine. NULL contract: NULL/short query vector, NULL codes
  * array, codes length ≠ M, or an out-of-range code → NULL. */
case class PqAdc(left: Expression, right: Expression,
                 codebook: Array[Array[Array[Long]]])
    extends BinaryExpression {

  // a malformed codebook must fail at CONSTRUCTION with a message, not
  // as an NPE when `sub` first dereferences codebook(0)(0) at planning
  // (r12 advice); uniformity is what the eval loops assume
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_adc codebook must carry M >= 1 subspaces of K >= 1 centroids")
  require({
    val k0 = codebook(0).length
    val s0 = codebook(0)(0).length
    s0 >= 1 && codebook.forall(sp =>
      sp.length == k0 && sp.forall(_.length == s0))
  }, "pq_adc codebook must be uniform in K and subDim")

  // Array fields compare by REFERENCE under case-class equality, which
  // would defeat expression canonicalization/dedup (two semantically
  // identical PqAdc nodes would never be recognized as equal) — deep
  // content equality restores it (r12 advice)
  override def equals(other: Any): Boolean = other match {
    case p: PqAdc => left == p.left && right == p.right &&
      java.util.Arrays.deepEquals(codebook.asInstanceOf[Array[AnyRef]],
        p.codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  // Catalyst hashes expression nodes repeatedly across rule batches —
  // cache the O(M·K·subDim) deep walk (r13 review)
  @transient private lazy val cachedHash: Int = java.util.Objects.hash(
    left, right,
    Integer.valueOf(
      java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])))
  override def hashCode(): Int = cachedHash

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<float>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  @transient private lazy val m: Int = codebook.length
  @transient private lazy val sub: Int =
    if (m == 0) 0 else codebook(0)(0).length
  @transient private lazy val k: Int = if (m == 0) 0 else codebook(0).length

  @transient private lazy val mayHaveNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (v.numElements() < m * sub || codes.numElements() != m) return null
    if (mayHaveNullElements) {
      var i = 0
      while (i < m * sub) { if (v.isNullAt(i)) return null; i += 1 }
      i = 0
      while (i < m) { if (codes.isNullAt(i)) return null; i += 1 }
    }
    var acc = 0L
    var mi = 0
    while (mi < m) {
      val c = codes.getInt(mi)
      if (c < 0 || c >= k) return null
      val e = codebook(mi)(c)
      var j = 0
      while (j < sub) {
        val q = math.floor(
          v.getFloat(mi * sub + j).toDouble * 65536.0 + 0.5).toLong
        val diff = q - e(j)
        acc += diff * diff
        j += 1
      }
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "long[][][]")
    nullSafeCodeGen(ctx, ev, (v, codes) => {
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      val diff = ctx.freshName("diff")
      val e = ctx.freshName("e")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      val nullScan = if (mayHaveNullElements) {
        s"""if (!$bad) {
           |  for (int $i = 0; $i < ${m * sub}; $i++) {
           |    if ($v.isNullAt($i)) { $bad = true; break; }
           |  }
           |  for (int $i = 0; $i < $m; $i++) {
           |    if ($codes.isNullAt($i)) { $bad = true; break; }
           |  }
           |}""".stripMargin
      } else ""
      s"""
         |${ev.value} = 0L;
         |boolean $bad =
         |  $v.numElements() < ${m * sub} || $codes.numElements() != $m;
         |$nullScan
         |if (!$bad) {
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    int $c = $codes.getInt($mi);
         |    if ($c < 0 || $c >= $k) { $bad = true; break; }
         |    long[] $e = $cbRef[$mi][$c];
         |    for (int $j = 0; $j < $sub; $j++) {
         |      long $q = (long) Math.floor(
         |        (double) $v.getFloat($mi * $sub + $j) * 65536.0d + 0.5d);
         |      long $diff = $q - $e[$j];
         |      ${ev.value} += $diff * $diff;
         |    }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; ${ev.value} = 0L; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Column-API entry point: ADC(query floats, candidate codes). */
  def adc(queryVec: Column, codes: Column,
          codebook: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(queryVec),
      ColumnBridge.expression(codes), codebook))
}
