package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins VecDot's contract: bit-identical to the HOF aggregate/zip_with
  * chain it replaced (the form the DuckDB oracle's list_sum mirrors),
  * and the NULL semantics on mismatch/null-element inputs. */
class VecDotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("vec_dot is bit-identical to the HOF fold (incl. normSq self-dot)") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val df = Seq.fill(200)((
      Array.fill(64)((rnd.nextGaussian() * 3).toFloat),
      Array.fill(64)((rnd.nextGaussian() * 3).toFloat)))
      .toDF("a", "b")
    val hofDot = expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) " +
      "* cast(y as double)), 0d, (acc, v) -> acc + v)")
    val hofNorm = expr("aggregate(a, 0d, (acc, x) -> acc + " +
      "cast(x as double) * cast(x as double))")
    val rows = df.select(
      VecDot.dot(col("a"), col("b")).as("nd"), hofDot.as("hd"),
      VecDot.normSq(col("a")).as("nn"), hofNorm.as("hn")).collect()
    rows.foreach { case Row(nd: Double, hd: Double, nn: Double, hn: Double) =>
      // exact bit equality, not approximate — same IEEE sequence
      assert(java.lang.Double.doubleToLongBits(nd) ==
        java.lang.Double.doubleToLongBits(hd))
      assert(java.lang.Double.doubleToLongBits(nn) ==
        java.lang.Double.doubleToLongBits(hn))
    }
  }

  test("NULL contract: length mismatch, null element, empty arrays") {
    val df = spark.sql(
      """SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS a2,
        |       array(CAST(3.0 AS FLOAT)) AS a1,
        |       array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS an,
        |       array() AS ae""".stripMargin)
      .select(
        VecDot.dot(col("a2"), col("a1")).as("mismatch"),
        VecDot.dot(col("a2"), col("an")).as("nullelem"),
        VecDot.dot(col("ae").cast("array<float>"),
          col("ae").cast("array<float>")).as("empty"),
        VecDot.dot(col("a2"), col("a2")).as("selfdot"))
    val r = df.collect()(0)
    assert(r.isNullAt(0)) // length mismatch
    assert(r.isNullAt(1)) // null element
    assert(r.getDouble(2) == 0.0) // empty fold seed
    assert(r.getDouble(3) == 5.0)
  }

  test("vec_dot is reachable from SQL via the extension registry") {
    graft.GraftExtensions.register(
      org.apache.spark.sql.graftbridge.ColumnBridge.registry(spark))
    val v = spark.sql(
      "SELECT vec_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(v == 23.0)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getErrorClass != null && e.getErrorClass.startsWith("WRONG_NUM_ARGS"))
  }
}
