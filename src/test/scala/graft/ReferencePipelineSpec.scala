package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.Layout
import graft.sources.rfc.{MockRfcBackend, RfcField}
import graft.sources.rfc.MockRfcBackend.MockTable

/** End-to-end replay of the reference job's entire data path on the
  * Spark-native stack: `sap-rfc` DSv2 scan (mock backend, PERMISSIVE
  * routing) → good/err split → `Layout` dated dual-write — i.e. what
  * `pyrfc_read_table.py` does in 231 driver-side lines, as one lazy plan
  * plus a sink call. */
class ReferencePipelineSpec extends AnyFunSuite with BeforeAndAfterEach {
  private lazy val spark = SparkTestBase.spark

  override def beforeEach(): Unit = MockRfcBackend.clear()

  test("source → route → dated dual-layout sink, reference quirks intact") {
    val fields = Seq(RfcField("MANDT", "C"), RfcField("DOCNUM", "N"),
      RfcField("NOTE", "C"))
    MockRfcBackend.register("ZDOC", MockTable(
      fields,
      rows = (1 to 7).map(i => Seq("100", f"$i%06d", s"note $i")),
      rawWa = Seq("100`8", "100`9`x`y"))) // under- and over-arity

    val df = spark.read.format("sap-rfc")
      .option("table", "ZDOC").option("mode", "PERMISSIVE").load()
    val good = df.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val err = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("wa"))

    val root = Files.createTempDirectory("ref-pipeline-").toString
    val ts = "2024-01-01-00-00-00"
    val res = Layout.writeDual(good, err, root, "parquet", "zdoc", ts)
    assert(res.goodRows == 7 && res.errRows == 2)

    // cumulative-rowcount filename; err present because err_count > 0,
    // named <table>-err.<fmt> with no count (reference `:50`)
    assert(Files.exists(
      Paths.get(s"$root/result/parquet/zdoc/$ts/zdoc7.parquet")))
    assert(Files.exists(
      Paths.get(s"$root/result-err/parquet/zdoc/$ts/zdoc-err.parquet")))

    // typed roundtrip: N column came back as longs through the source
    val back = spark.read.parquet(s"$root/result/parquet/zdoc/$ts")
    assert(back.schema("DOCNUM").dataType.typeName == "long")
    assert(back.agg(sum("DOCNUM")).head.getLong(0) == (1 to 7).sum.toLong)

    // err rows are header-less (integer column names) and carry raw WA
    val errBack = spark.read.parquet(s"$root/result-err/parquet/zdoc/$ts")
    assert(errBack.columns.toSeq == Seq("0"))
    assert(errBack.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("100`8", "100`9`x`y"))
  }
}
