package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.3 is the normative operator inventory the round review
  * checks line by line; SparkEntry.queries is what actually runs. This
  * spec makes drift impossible: every declared `qNN_*` table row must
  * be registered, and every registered query must have its §2.3 row.
  * (No-oracle utility components — SkewJoin, ClusteredWrite, ZOrderWrite,
  * BucketedTables, SketchRollup, streaming — are declared as `— `-prefixed
  * rows without a qNN id and are covered by their own suites.) */
class SurveyDriftSpec extends AnyFunSuite {

  private val qid = """\| `(q\d+[a-z0-9_]*)`""".r

  test("SURVEY §2.3 rows and SparkEntry.queries are identical sets") {
    val lines = Files.readAllLines(Paths.get("SURVEY.md")).asScala
    val sec = lines
      .dropWhile(!_.startsWith("### 2.3"))
      .takeWhile(l => !l.startsWith("### 2.4"))
    val declared = sec.collect {
      case l if l.startsWith("| `q") =>
        qid.findFirstMatchIn(l).map(_.group(1))
    }.flatten.toSet
    val registered = SparkEntry.queries.keySet

    val unregistered = declared -- registered
    val undeclared = registered -- declared
    assert(unregistered.isEmpty,
      s"declared in SURVEY §2.3 but not registered: ${unregistered.toSeq.sorted}")
    assert(undeclared.isEmpty,
      s"registered but missing a SURVEY §2.3 row: ${undeclared.toSeq.sorted}")
    // (oracle-without-query orphans are DataContractSpec's invariant)
  }

  // ---- oracle output-type lint (r13 verdict item 2) -----------------
  //
  // The driver hash-compares cell RENDERINGS, and exotic column types
  // render differently across engine/pyarrow versions: DuckDB widens
  // SUM(BIGINT) to HUGEINT, and the one query whose oracle emitted a
  // HUGEINT (q160) hash-failed for three rounds while rows and schema
  // names matched. Two guards close the class:
  //  1. here — every hash-compared Spark result schema stays inside a
  //     closed set of render-stable types (no Decimal, no Binary, no
  //     CalendarInterval in a final projection);
  //  2. tools/check_oracle.py — the DuckDB side of the same lint
  //     (HUGEINT/DECIMAL in either relation fails the local gate before
  //     the driver ever sees it). This spec pins that the python lint
  //     stays present so it cannot silently rot.

  import org.apache.spark.sql.types._

  private def renderStable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
        FloatType | StringType | BooleanType | DateType | TimestampType |
        TimestampNTZType => true
    case ArrayType(e, _) => renderStable(e)
    case _ => false // DecimalType (HUGEINT twin), BinaryType, structs, maps
  }

  test("every hash-compared query's output schema uses only " +
    "render-stable types (no Decimal/Binary/struct in a final projection)") {
    val spark = SparkTestBase.spark
    for (name <- SparkEntry.oracleSql.keySet.toSeq.sorted) {
      val schema = SparkEntry.queries(name)(spark, SparkTestBase.Sf0001).schema
      val bad = schema.fields.filterNot(f => renderStable(f.dataType))
      assert(bad.isEmpty,
        s"$name emits hash-unstable output column(s): " +
          bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
  }

  test("tools/check_oracle.py carries the DuckDB-side output-type lint") {
    val py = new String(Files.readAllBytes(Paths.get("tools/check_oracle.py")))
    assert(py.contains("TYPE-LINT") && py.contains("HUGEINT"),
      "the oracle-side type lint was removed from tools/check_oracle.py")
  }
}
