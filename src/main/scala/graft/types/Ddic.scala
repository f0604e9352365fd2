package graft.types

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SAP ABAP DDIC type codes → Spark types (SURVEY.md §1.2).
  *
  * Reference behavior (`/root/reference/pyrfc_read_table/pyrfc_read_table.py`):
  * the RFC result's `FIELDS` metadata carries a one-char `TYPE` per column
  * (`:128-133`); the reference consumes exactly one code — `'N'` numeric
  * text, coerced to int with `errors='ignore'` (`:172-174`, all-or-nothing
  * per column) — and leaves every other code as a string.
  *
  * This map covers the full DDIC code set with an unknown-code→string
  * fallback, and its casts are **per-value** tolerant (`try_cast`
  * semantics): a single malformed cell becomes NULL instead of silently
  * degrading the whole column to strings. That is the documented
  * improvement over the reference (`:174`), and the only intentional
  * behavior difference.
  */
object Ddic {

  /** Spark type for a DDIC code. `length`/`decimals` are the FIELDS
    * LENGTH/DECIMALS metadata, used only by `P` (packed decimal). */
  def toSpark(code: String, length: Int = 0, decimals: Int = 0): DataType =
    code match {
      case "C" => StringType                       // char
      case "N" => LongType                         // numeric text
      case "D" => DateType                         // YYYYMMDD
      case "T" => StringType                       // HHMMSS (kept textual)
      case "P" => DecimalType(math.max(length, 1), math.max(decimals, 0))
      case "I" => IntegerType
      case "F" => DoubleType
      case "X" => BinaryType                       // raw hex
      case _   => StringType                       // unknown code fallback
    }

  /** Typed conversion of a (trimmed) string cell for a DDIC code.
    * Every branch is null-on-failure (per-value tolerance), ANSI-safe,
    * and codegen'd — no UDFs. Cost note: `try_cast`'s FAILURE path is
    * exception-per-row (~12 µs, the r15 q05 measurement —
    * [[graft.ops.Scalars.tolerantLong]]); fine here because DDIC-typed
    * SAP columns are overwhelmingly valid, but a mostly-invalid feed
    * should route through a regex-guarded cast of that shape. */
  def castColumn(c: Column, code: String, length: Int = 0,
                 decimals: Int = 0): Column = code match {
    case "C" => c
    case "N" => c.try_cast(LongType)
    case "D" => try_to_timestamp(c, lit("yyyyMMdd")).cast(DateType)
    case "T" => c
    case "P" => c.try_cast(
      DecimalType(math.max(length, 1), math.max(decimals, 0)))
    case "I" => c.try_cast(IntegerType)
    case "F" => c.try_cast(DoubleType)
    case "X" => try_to_binary(c, lit("hex"))
    case _   => c
  }

  /** Catalyst-value parse of one (already trimmed) WA cell — same
    * per-value tolerance as [[castColumn]], used by the `sap-rfc` DSv2
    * reader to build `InternalRow`s directly. Returns null on failure. */
  def parseCatalyst(v: String, code: String, length: Int = 0,
                    decimals: Int = 0): Any = code match {
    case "C" | "T" => UTF8String.fromString(v)
    case "N" => v.toLongOption.map(Long.box).orNull
    case "D" =>
      try Int.box(
        LocalDate.parse(v, DateTimeFormatter.BASIC_ISO_DATE).toEpochDay.toInt)
      catch { case _: Exception => null }
    case "P" =>
      try {
        val d = Decimal(new java.math.BigDecimal(v))
        if (d.changePrecision(math.max(length, 1), math.max(decimals, 0))) d
        else null
      } catch { case _: Exception => null }
    case "I" => v.toIntOption.map(Int.box).orNull
    case "F" => v.toDoubleOption.map(Double.box).orNull
    case "X" =>
      // empty → empty bytes (matches try_to_binary('') in castColumn)
      if (v.length % 2 == 0 && v.forall(c => Character.digit(c, 16) >= 0))
        v.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      else null
    case _ => UTF8String.fromString(v)
  }
}
