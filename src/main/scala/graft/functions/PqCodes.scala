package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization encoder as a native codegen'd expression: for
  * each of the codebook's M subspaces, the index of the nearest
  * codebook entry to the input vector's subvector (squared-L2 in the
  * 2¹⁶ fixed-point integer grid, ties → lowest code id). Returns the
  * M-element code array — the 64×-compressed representation a PQ
  * vector index stores per vector (q194).
  *
  * The codebook rides the expression as a constant
  * `long[M][K][subDim]` of PRE-quantized entries
  * ([[graft.functions.FixDot]]'s grid), inlined via
  * `addReferenceObj` the way [[SrpBucket]] carries its plane matrix —
  * the M·K·subDim distance loop stays inside whole-stage codegen with
  * a few hundred bytes of generated Java.
  *
  * Determinism: the input quantization is the FixDot per-element chain
  * (exact ×2¹⁶ shift, exact +½, floor); every distance is an INTEGER
  * sum of squared integer differences and the argmin compares
  * integers, so the codes — and everything downstream of them (ADC
  * tables, ranked probes) — are bit-identical in any engine.
  *
  * NULL contract (mirrors [[SrpBucket]]): a vector shorter than
  * M·subDim or holding a NULL element yields NULL. */
case class PqCodes(child: Expression, codebook: Array[Array[Array[Long]]])
    extends UnaryExpression {

  // same construction contract and structural equality as [[PqAdc]]
  // (r12 advice): malformed codebooks fail loudly at build time, and
  // the Array field gets deep equality so canonicalization can dedup
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "pq_codes codebook must carry M >= 1 subspaces of K >= 1 centroids")
  require({
    val k0 = codebook(0).length
    val s0 = codebook(0)(0).length
    s0 >= 1 && codebook.forall(sp =>
      sp.length == k0 && sp.forall(_.length == s0))
  }, "pq_codes codebook must be uniform in K and subDim")

  override def equals(other: Any): Boolean = other match {
    case p: PqCodes => child == p.child &&
      java.util.Arrays.deepEquals(codebook.asInstanceOf[Array[AnyRef]],
        p.codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  // cached: Catalyst hashes nodes repeatedly across rule batches
  @transient private lazy val cachedHash: Int = java.util.Objects.hash(
    child,
    Integer.valueOf(
      java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])))
  override def hashCode(): Int = cachedHash

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"
  override def nullable: Boolean = true

  @transient private lazy val dims: Int =
    if (codebook.isEmpty) 0 else codebook.length * codebook(0)(0).length

  @transient private lazy val mayHaveNullElements: Boolean =
    child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dims) return null
    if (mayHaveNullElements) {
      var i = 0
      while (i < dims) { if (arr.isNullAt(i)) return null; i += 1 }
    }
    val m = codebook.length
    val sub = codebook(0)(0).length
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val cb = codebook(mi)
      var best = 0
      var bestD = Long.MaxValue
      var k = 0
      while (k < cb.length) {
        val e = cb(k)
        var d = 0L
        var j = 0
        while (j < sub) {
          val q = math.floor(
            arr.getFloat(mi * sub + j).toDouble * 65536.0 + 0.5).toLong
          val diff = q - e(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "long[][][]")
    val m = codebook.length
    val sub = if (m == 0) 0 else codebook(0)(0).length
    nullSafeCodeGen(ctx, ev, arr => {
      val mi = ctx.freshName("mi")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      val diff = ctx.freshName("diff")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val out = ctx.freshName("out")
      val cb = ctx.freshName("cb")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val nullScan = if (mayHaveNullElements) {
        s"""if ($arr.numElements() >= $dims) {
           |  for (int $i = 0; $i < $dims; $i++) {
           |    if ($arr.isNullAt($i)) { ${i}_hasNull = true; break; }
           |  }
           |}""".stripMargin
      } else ""
      s"""
         |boolean ${i}_hasNull = false;
         |$nullScan
         |if ($arr.numElements() < $dims || ${i}_hasNull) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = null;
         |} else {
         |  int[] $out = new int[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    long[][] $cb = $cbRef[$mi];
         |    int $best = 0;
         |    long $bestD = Long.MAX_VALUE;
         |    for (int $k = 0; $k < $cb.length; $k++) {
         |      long[] $e = $cb[$k];
         |      long $d = 0L;
         |      for (int $j = 0; $j < $sub; $j++) {
         |        long $q = (long) Math.floor(
         |          (double) $arr.getFloat($mi * $sub + $j) * 65536.0d + 0.5d);
         |        long $diff = $q - $e[$j];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $k; }
         |    }
         |    $out[$mi] = $best;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  /** Column-API entry point: the M-element PQ code array of `v`. */
  def codes(v: Column, codebook: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(v), codebook))
}
