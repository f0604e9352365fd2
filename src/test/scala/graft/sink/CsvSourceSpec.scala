package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** q189 CSV round trip: typed equality row-for-row against the source
  * parquet (doubles bit-identical through shortest-round-trip text,
  * timestamps through the ISO form), quoted-comma survival, and the
  * explicit-schema contract. */
class CsvSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val (path, schema) =
    CsvQueries.ensureCsvOrders(spark, SparkTestBase.Sf0001)
  private lazy val back =
    spark.read.schema(schema).option("header", "true").csv(path)

  test("typed row round trip is exact: keys, doubles, timestamps, and " +
    "the comma-bearing note survive bit-for-bit") {
    val src = T(spark, SparkTestBase.Sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"),
        concat(col("o_orderpriority"), lit(", "), col("o_orderstatus"))
          .as("o_note"))
      .orderBy("o_orderkey").collect().map(_.toSeq)
    val got = back.orderBy("o_orderkey").collect().map(_.toSeq)
    assert(got.length == src.length)
    assert(got.toSeq == src.toSeq, "CSV round trip changed a value")
  }

  test("every note still carries its embedded comma (quoting held)") {
    val n = back.filter(!col("o_note").contains(", ")).count()
    assert(n == 0, s"$n notes lost their comma — quoting broke arity")
  }

  test("the read schema is the declared (source-derived) one — " +
    "including the timestamp flavor the parquet side dispatched") {
    assert(back.schema == schema)
    val srcType = T(spark, SparkTestBase.Sf0001, "orders")
      .schema("o_orderdate").dataType
    assert(schema("o_orderdate").dataType == srcType,
      "CSV schema re-typed the timestamp flavor")
  }

  test("q189 aggregate is non-degenerate") {
    val rows = CsvQueries.q189CsvRoundtrip(spark, SparkTestBase.Sf0001)
      .collect()
    assert(rows.length >= 2, "expected at least two order statuses")
  }
}
