package graft.types

import java.sql.Date

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Per-code tests for the DDIC→Spark type map (SURVEY.md §1.2; reference
  * `pyrfc_read_table.py:128-133,172-174`), including the `N` tolerant cast
  * and the unknown-code→string fallback. */
class DdicSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("type map covers every DDIC code plus unknown fallback") {
    assert(Ddic.toSpark("C") == StringType)
    assert(Ddic.toSpark("N") == LongType)
    assert(Ddic.toSpark("D") == DateType)
    assert(Ddic.toSpark("T") == StringType)
    assert(Ddic.toSpark("P", length = 13, decimals = 2) == DecimalType(13, 2))
    assert(Ddic.toSpark("I") == IntegerType)
    assert(Ddic.toSpark("F") == DoubleType)
    assert(Ddic.toSpark("X") == BinaryType)
    assert(Ddic.toSpark("Z") == StringType) // unknown code
    assert(Ddic.toSpark("") == StringType)
  }

  private def castOne(v: String, code: String, len: Int = 0,
                      dec: Int = 0): Any = {
    val df = Seq(v).toDF("v")
      .select(Ddic.castColumn(col("v"), code, len, dec).as("c"))
    df.collect().head.get(0)
  }

  test("N: numeric text to long, leading zeros ok (fixture DOCNUM)") {
    assert(castOne("0000012345", "N") == 12345L)
  }

  test("N: malformed value is per-value null (vs the reference's " +
    "all-or-nothing errors='ignore', pyrfc_read_table.py:174)") {
    assert(castOne("00ABC", "N") == null)
  }

  test("D: YYYYMMDD to date; malformed to null") {
    assert(castOne("20240115", "D") == Date.valueOf("2024-01-15"))
    assert(castOne("2024011", "D") == null)
    assert(castOne("ABCDEFGH", "D") == null)
  }

  test("P: packed decimal with length/decimals metadata") {
    assert(castOne("199.99", "P", 13, 2) == new java.math.BigDecimal("199.99"))
    assert(castOne("boom", "P", 13, 2) == null)
  }

  test("I and F: int and float casts, tolerant") {
    assert(castOne("42", "I") == 42)
    assert(castOne("x", "I") == null)
    assert(castOne("1.0825", "F") == 1.0825)
    assert(castOne("x", "F") == null)
  }

  test("X: raw hex to binary") {
    assert(castOne("0A", "X").asInstanceOf[Array[Byte]].toSeq == Seq(0x0a.toByte))
  }

  test("C, T, unknown: string passthrough") {
    assert(castOne("100", "C") == "100")
    assert(castOne("134501", "T") == "134501")
    assert(castOne("anything", "Z") == "anything")
  }

  test("parseCatalyst (DSv2 reader path) agrees with castColumn " +
    "(DataFrame path) on every code and on malformed values") {
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq(
      ("100", "C", 0, 0), ("0000012345", "N", 0, 0), ("00ABC", "N", 0, 0),
      ("20240115", "D", 0, 0), ("2024011", "D", 0, 0),
      ("134501", "T", 0, 0), ("199.99", "P", 13, 2), ("boom", "P", 13, 2),
      ("42", "I", 0, 0), ("x", "I", 0, 0), ("1.0825", "F", 0, 0),
      ("0A", "X", 0, 0), ("zz", "X", 0, 0), ("", "X", 0, 0),
      ("w", "?", 0, 0))
    for ((v, code, len, dec) <- cases) {
      val viaColumn = castOne(v, code, len, dec)
      val viaCatalyst = Ddic.parseCatalyst(v, code, len, dec) match {
        case null => null
        case u: UTF8String => u.toString
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case days: Integer if code == "D" =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
        case other => other
      }
      (viaColumn, viaCatalyst) match {
        case (a: Array[Byte], b: Array[Byte]) =>
          assert(a.toSeq == b.toSeq, s"$code($v)")
        case (a, b) => assert(a == b, s"$code($v): column=$a catalyst=$b")
      }
    }
  }
}
