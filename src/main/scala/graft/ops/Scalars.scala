package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.3 q05, q60–q64).
  * All built-in codegen'd `functions._` — no UDFs in this file. */
object Scalars {

  /** Error-tolerant string→LONG: `try_cast` behind a cheap regex guard.
    *
    * The r15 measurement that motivates the guard (the r14 bench-board
    * question "where do q05's 2.4s go?"): under ANSI mode, `try_cast`'s
    * FAILURE path throws and catches a java exception PER ROW — ~12 µs
    * each, 1.24 s for 100k always-failing rows at sf0.1, while the
    * success path (and the JSON parse the verdict suspected) costs
    * ~0.4 s. At 100 TB the tolerant cast exists precisely for dirty
    * columns where failures are common — exception-per-bad-row is a
    * scale defect. The integer-literal regex short-circuits clean
    * failures before the exception machinery (measured 0.15 s, 8×);
    * `try_cast` stays inside the guard so regex-passing-but-overflowing
    * values still return NULL with ANSI-exact semantics. */
  private[ops] def tolerantLong(c: String): String =
    s"CASE WHEN $c rlike '^\\\\s*[+-]?[0-9]+\\\\s*$$' " +
      s"THEN try_cast($c AS LONG) END"

  /** q05: error-tolerant numeric-text cast (reference R6,
    * `pyrfc_read_table.py:172-174` — per-value tolerant cast is the
    * documented improvement over pandas' all-or-nothing
    * `errors='ignore'`). Both casts ride [[tolerantLong]] — see its
    * scaladoc for why naked `try_cast` is a scale defect on
    * mostly-invalid columns (the r15 q05-timing measurement). */
  def q05CastNumericText(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(
        col("event_id"),
        expr(tolerantLong("get_json_object(props, '$.k')")).as("k_long"),
        expr(tolerantLong("concat(event_type, 'x')")).as("poison"))
      .orderBy("event_id")

  /** q60: string functions (trim is reference R5). */
  def q60StrFuncs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        substring(col("p_name"), 1, 5).as("name5"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_size").cast("string")).as("brand_size"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"))
      .orderBy("p_partkey")

  /** q61: date/time functions. */
  def q61DateFuncs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        to_date(date_trunc("month", col("o_orderdate"))).as("mon_start"),
        datediff(lit(java.sql.Date.valueOf("1998-12-01")), col("o_orderdate")).as("dd"))
      .orderBy("o_orderkey")

  /** q62: math functions. */
  def q62MathFuncs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_orderkey") < 50)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("extp2"),
        ceil(col("l_discount") * 100).as("ceil_disc"),
        floor(col("l_tax") * 100).as("floor_tax"),
        abs(col("l_quantity") - 25).as("absq"),
        round(sqrt(col("l_quantity")), 4).as("sqrtq"),
        (col("l_partkey") % 7).as("mod7"))
      .orderBy("l_orderkey", "l_linenumber")

  /** q63: array / higher-order functions over embeddings. Lambda casts to
    * double keep the fold bit-identical with the oracle's left-assoc sum. */
  def q63ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        round(
          aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (acc, x) => acc + x.cast("double")), 4).as("s8"))
      .orderBy("vec_id")

  /** q64: JSON extraction — path-based (`get_json_object`) and through
    * the transient MapType route (`from_json` → `element_at`), the map-
    * function surface SURVEY.md §2.2 declares. */
  def q64JsonFuncs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        element_at(from_json(col("props"), lit("map<string,bigint>")),
          lit("k")).as("k_map"))
      .orderBy("event_id")

  /** q131: Spark-4 `VariantType` JSON — `parse_json` decodes the string
    * ONCE into the variant binary encoding, and every extraction
    * (`variant_get` with a type argument, `try_variant_get` for paths
    * that may not exist) walks the pre-parsed tree. q64 is the classic
    * surface (each `get_json_object`/`from_json` re-parses the string);
    * at 100 TB a wide-props event table pays the parse cost once per row
    * here instead of once per extracted field — the reason Variant
    * exists. A missing path under `try_variant_get` is null, never an
    * error (the q05 tolerant-cast discipline). */
  def q131VariantExtract(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(col("event_id"), expr("parse_json(props)").as("v"))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k_long"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("k_missing"))
      .orderBy("event_id")

  /** q66: regex group extraction — the structured-field-from-text
    * surface (q84 counts matches, q91 replaces; this EXTRACTS). Both
    * engines return '' for a no-match, and the patterns stay inside the
    * Java∩RE2 common dialect (q91's portability rule). */
  def q66RegexExtract(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part")
      .select(
        col("p_partkey"),
        // nullif before the cast: regexp_extract's no-match '' would
        // throw under ANSI cast (and error the oracle's CAST) — the
        // ''-on-no-match parity only holds for the string columns
        nullif(regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1), lit(""))
          .cast("long").as("brand_no"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_extract(col("p_type"), "([0-9]+)", 1).as("type_digits"))
      .orderBy("p_partkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q05_cast_numeric_text" -> q05CastNumericText _,
    "q60_str_funcs" -> q60StrFuncs _,
    "q61_date_funcs" -> q61DateFuncs _,
    "q62_math_funcs" -> q62MathFuncs _,
    "q63_array_funcs" -> q63ArrayFuncs _,
    "q64_json_funcs" -> q64JsonFuncs _,
    "q66_regex_extract" -> q66RegexExtract _,
    "q131_variant_extract" -> q131VariantExtract _,
  )

  val oracle: Map[String, String] = Map(
    "q05_cast_numeric_text" ->
      """SELECT event_id,
        |       try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        |       try_cast(event_type || 'x' AS BIGINT) AS poison
        |FROM events ORDER BY event_id""".stripMargin,
    "q60_str_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_up, lower(p_type) AS type_lo,
        |       substring(p_name, 1, 5) AS name5, CAST(length(p_name) AS INTEGER) AS name_len,
        |       concat_ws('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
        |       trim(' ' || p_name || ' ') AS name_trim
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q61_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(month(o_orderdate) AS INTEGER) AS mo,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS INTEGER) AS dd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q62_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS extp2,
        |       CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_disc,
        |       CAST(floor(l_tax * 100) AS BIGINT) AS floor_tax,
        |       abs(l_quantity - 25) AS absq,
        |       round(sqrt(l_quantity), 4) AS sqrtq,
        |       l_partkey % 7 AS mod7
        |FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q63_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 4) AS e1,
        |       round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE) +
        |             CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) +
        |             CAST(embedding[5] AS DOUBLE) + CAST(embedding[6] AS DOUBLE) +
        |             CAST(embedding[7] AS DOUBLE) + CAST(embedding[8] AS DOUBLE), 4) AS s8
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q64_json_funcs" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_map
        |FROM events ORDER BY event_id""".stripMargin,
    "q66_regex_extract" ->
      """SELECT p_partkey,
        |       CAST(nullif(regexp_extract(p_brand, 'Brand#([0-9]+)', 1), '') AS BIGINT) AS brand_no,
        |       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |       regexp_extract(p_type, '([0-9]+)', 1) AS type_digits
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q131_variant_extract" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(NULL AS BIGINT) AS k_missing
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
