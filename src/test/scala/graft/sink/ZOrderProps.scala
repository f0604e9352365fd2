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

  /** Bit-by-bit reference: bit i of a → bit 2i, bit i of b → bit 2i+1. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private val key: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(0L, 0xFFFFFFFFL),             // arbitrary 32-bit
    Gen.oneOf(0L, 1L, 0x7FFFFFFFL, 0x80000000L, 0xFFFFFFFFL)) // edges

  property("codegen zvalue == bit-by-bit reference") =
    Prop.forAll(Gen.listOfN(64, Gen.zip(key, key))) { pairs =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val got = pairs.toDF("a", "b")
        .select(ZOrderWrite.zvalue(col("a"), col("b")).as("z"))
        .collect().map(_.getLong(0)).toSeq
      val want = pairs.map { case (a, b) => mortonRef(a, b) }
      got == want
    }
}
