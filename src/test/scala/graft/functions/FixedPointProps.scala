package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** The r12 fixed-point kernels against plain-Scala references on
  * RANDOM vectors (negatives, subnormal-ish magnitudes, exact grid
  * points): FixDot's dot and normSq, PqCodes' per-subspace argmin, and
  * PqAdc's asymmetric distance must all equal the brute-force integer
  * arithmetic bit-for-bit — the determinism contract every IVF/PQ
  * oracle (q93..q195) leans on. Evaluates the expressions' interpreted
  * path directly (codegen equality is CodegenGuardSpec's job). */
object FixedPointProps extends Properties("FixedPoint") {

  private def q(x: Float): Long =
    math.floor(x.toDouble * 65536.0 + 0.5).toLong

  private val comp: Gen[Float] = Gen.chooseNum(-1.0f, 1.0f)
  private def vec(n: Int): Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](n, comp)

  private def lit(v: Array[Float]): Literal =
    Literal.create(v, ArrayType(FloatType, containsNull = false))

  property("FixDot.dot equals the brute integer dot") =
    Prop.forAll(vec(16), vec(16)) { (a, b) =>
      val expr = FixDot(lit(a), lit(b))
      val got = expr.eval(InternalRow.empty).asInstanceOf[Long]
      got == a.zip(b).map { case (x, y) => q(x) * q(y) }.sum
    }

  property("FixDot.normSq is the self-dot and is non-negative") =
    Prop.forAll(vec(16)) { a =>
      val got = FixDot(lit(a), lit(a)).eval(InternalRow.empty)
        .asInstanceOf[Long]
      got == a.map(x => q(x) * q(x)).sum && got >= 0L
    }

  // 4 subspaces × 4 dims × 8 codes over 16-dim vectors
  private val cbGen: Gen[Array[Array[Array[Long]]]] =
    Gen.containerOfN[Array, Array[Float]](4 * 8, vec(4))
      .map { entries =>
        Array.tabulate(4)(m => Array.tabulate(8)(k =>
          entries(m * 8 + k).map(q)))
      }

  property("PqCodes equals the brute per-subspace argmin (lowest-code " +
    "tie-break)") =
    Prop.forAll(vec(16), cbGen) { (v, cb) =>
      val got = PqCodes(lit(v), cb).eval(InternalRow.empty)
        .asInstanceOf[ArrayData].toIntArray().toSeq
      val expect = (0 until 4).map { m =>
        val sub = (0 until 4).map(d => q(v(m * 4 + d)))
        (0 until 8).minBy { k =>
          (sub.indices.map(d => {
            val diff = sub(d) - cb(m)(k)(d); diff * diff
          }).sum, k)
        }
      }
      got == expect
    }

  property("PqAdc equals the brute table-free ADC and is the exact " +
    "quantized d2 to the reconstruction") =
    Prop.forAll(vec(16), cbGen) { (v, cb) =>
      val codes = PqCodes(lit(v), cb).eval(InternalRow.empty)
        .asInstanceOf[ArrayData]
      val adc = PqAdc(lit(v),
          Literal.create(codes.toIntArray(),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.IntegerType, containsNull = false)),
          cb).eval(InternalRow.empty).asInstanceOf[Long]
      val expect = (0 until 4).map { m =>
        val c = codes.getInt(m)
        (0 until 4).map { d =>
          val diff = q(v(m * 4 + d)) - cb(m)(c)(d); diff * diff
        }.sum
      }.sum
      adc == expect && adc >= 0L
    }

  property("degenerate inputs are NULL, never a prefix: short vector " +
    "or wrong-arity codes") =
    Prop.forAll(vec(15), cbGen) { (shortV, cb) =>
      val c1 = PqCodes(lit(shortV), cb).eval(InternalRow.empty)
      val a1 = PqAdc(lit(Array.fill(16)(0.5f)),
        Literal.create(Array(0, 0, 0),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType, containsNull = false)),
        cb).eval(InternalRow.empty)
      c1 == null && a1 == null
    }
}
