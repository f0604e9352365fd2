package graft.sink

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestBase

/** ScalaCheck pin for the codegen'd Morton interleave: the Catalyst
  * expression chain must agree bit-for-bit with an independent
  * pure-Scala bit-by-bit reference on arbitrary 32-bit keys (the
  * shift-mask magic constants are exactly the kind of code a typo
  * breaks on inputs no example-based test exercises). */
object ZOrderProps extends Properties("ZOrder") {

  // Each case runs a small Spark job; batch many keys per case instead.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  /** Bit-by-bit reference: bit i of dimension c → bit i·k + c. */
  private def mortonRef(vals: Seq[Long]): Long = {
    val k = vals.size
    var z = 0L
    for (c <- 0 until k; i <- 0 until ZOrderWrite.bitsPerDim(k))
      z |= ((vals(c) >> i) & 1L) << (i * k + c)
    z
  }

  private def key(k: Int): Gen[Long] = {
    val max = (1L << ZOrderWrite.bitsPerDim(k)) - 1
    Gen.oneOf(
      Gen.chooseNum(0L, max),                       // arbitrary in-range
      Gen.oneOf(0L, 1L, max / 2, max / 2 + 1, max)) // edges
  }

  // forAllNoShrink: default shrinking would shorten the inner lists
  // below k, turning a genuine counterexample into an arity crash
  // (bitsPerDim require / null array slot) that masks it
  private def prop(k: Int): Prop =
    Prop.forAllNoShrink(Gen.listOfN(48, Gen.listOfN(k, key(k)))) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val got = rows.map(_.mkString(","))
        .toDF("csv")
        .selectExpr((0 until k).map(i =>
          s"cast(split(csv, ',')[$i] as long) as c$i"): _*)
        .select(ZOrderWrite.zvalue((0 until k).map(i => col(s"c$i")): _*).as("z"))
        .collect().map(_.getLong(0)).toSeq
      got == rows.map(mortonRef)
    }

  property("codegen zvalue == bit-by-bit reference, k=2") = prop(2)
  property("codegen zvalue == bit-by-bit reference, k=3") = prop(3)
  property("codegen zvalue == bit-by-bit reference, k=4") = prop(4)
}
