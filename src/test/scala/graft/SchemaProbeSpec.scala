package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the schema-drift tripwire added after round 8 (the driver
  * regenerated events.parquet with a new `ts` physical type and 13
  * queries failed with opaque per-query errors): the probe must be
  * green on the current testdata, must accept every encoding the
  * engine dispatches on, and must NAME the table.column and observed
  * type on any drift. */
class SchemaProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("current testdata is drift-free at sf0.001 and sf0.01") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val lines = SchemaProbe.report(spark, s"/root/testdata/$sf")
      assert(lines.isEmpty, s"$sf: ${lines.mkString("; ")}")
    }
  }

  test("every T.tus-dispatched events.ts encoding is accepted") {
    for (t <- Seq(LongType, TimestampType, TimestampNTZType)) {
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", t),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      assert(SchemaProbe.diff("events", schema).isEmpty, s"rejected $t")
    }
  }

  test("a drifted events.ts names the column and the observed type") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", StringType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val lines = SchemaProbe.diff("events", schema)
    assert(lines.size == 1)
    assert(lines.head.contains("events.ts"), lines.head)
    assert(lines.head.contains("got string"), lines.head)
    assert(lines.head.contains("timestamp_ntz"), lines.head)
  }

  test("a missing column reports MISSING instead of throwing") {
    val schema = StructType(Seq(StructField("event_id", LongType)))
    val lines = SchemaProbe.diff("events", schema)
    assert(lines.exists(l => l.contains("events.ts") && l.contains("MISSING")),
      lines.mkString("; "))
  }

  test("an unknown table yields no spurious lines (probe covers only " +
    "declared tables)") {
    assert(SchemaProbe.diff("not_a_table",
      StructType(Seq(StructField("x", LongType)))).isEmpty)
  }
}
