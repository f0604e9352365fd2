package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.TrainingData

/** Pins the three-way agreement q86's LSH depends on: the codegen'd
  * [[SrpBucket]] expression, its interpreted `eval` path, and the
  * expanded ±cast SQL chain (the form the DuckDB oracle executes) must
  * assign the identical bucket to every vector. */
class SrpBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def vectors: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(7)
    // include sign-sensitive shapes: tiny magnitudes, exact zeros, and a
    // short (truncated) vector
    val dense = Seq.fill(50)(Array.fill(64)((rnd.nextGaussian() * 2).toFloat))
    val tiny = Seq.fill(10)(Array.fill(64)((rnd.nextGaussian() * 1e-6).toFloat))
    val zeros = Seq(Array.fill(64)(0f))
    dense ++ tiny ++ zeros
  }

  test("codegen, interpreted eval, and the oracle SQL chain agree") {
    import spark.implicits._
    val df = vectors.toDF("embedding")
    val chain = expr(TrainingData.lshBucketSql(
      j => s"element_at(embedding, $j)", c => s"cast($c as int)"))
    val rows = df
      .withColumn("b_expr", SrpBucket.bucket(col("embedding"), TrainingData.lshPlanes))
      .withColumn("b_chain", chain)
      .collect()
    assert(rows.length == vectors.length)
    rows.foreach { case Row(_, be: Int, bc: Int) => assert(be == bc) }

    // interpreted path (direct eval, no codegen)
    val e = SrpBucket(
      BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = true),
      TrainingData.lshPlanes)
    vectors.zip(rows).foreach { case (v, Row(_, be: Int, _)) =>
      val interpreted = e.eval(InternalRow(ArrayData.toArrayData(v)))
      assert(interpreted == be)
    }
  }

  test("all-zero buckets to 0; short/empty vectors are NULL (the DuckDB " +
    "chain's answer — they must drop out of bucket joins, not prefix-bucket)") {
    import spark.implicits._
    val df = Seq(Array.fill(64)(0f), Array(1f, -1f), Array.empty[Float])
      .toDF("embedding")
      .withColumn("b", SrpBucket.bucket(col("embedding"), TrainingData.lshPlanes))
    val bs = df.select("b").collect()
    assert(!bs(0).isNullAt(0) && bs(0).getInt(0) == 0) // dot == 0 is not > 0
    assert(bs(1).isNullAt(0)) // 2 of 64 dims
    assert(bs(2).isNullAt(0)) // empty
    // interpreted path agrees
    val e = SrpBucket(
      BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = true),
      TrainingData.lshPlanes)
    assert(e.eval(InternalRow(ArrayData.toArrayData(Array(1f, -1f)))) == null)
  }

  test("a NULL element yields a NULL bucket (the DuckDB chain's answer — " +
    "not a silent 0.0 read), in both codegen and interpreted paths") {
    // array<float> with containsNull=true carrying one null slot
    val df = spark.sql(
      """SELECT transform(sequence(1, 64),
        |                 i -> CAST(if(i = 5, NULL, 0.5) AS FLOAT)) AS embedding
        |UNION ALL
        |SELECT transform(sequence(1, 64), i -> CAST(0.5 AS FLOAT))""".stripMargin)
      .withColumn("b", SrpBucket.bucket(col("embedding"), TrainingData.lshPlanes))
    val bs = df.select("b").collect()
    assert(bs(0).isNullAt(0))  // null element → NULL bucket
    assert(!bs(1).isNullAt(0)) // same vector without the null → real bucket
    // interpreted path agrees
    val e = SrpBucket(
      BoundReference(0, ArrayType(FloatType, containsNull = true), nullable = true),
      TrainingData.lshPlanes)
    val withNull: Array[Any] =
      Array.tabulate[Any](64)(i => if (i == 4) null else 0.5f)
    assert(e.eval(InternalRow(ArrayData.toArrayData(withNull))) == null)
  }
}
