package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.rfc.{MockRfcBackend, RfcField}
import graft.sources.rfc.MockRfcBackend.MockTable

/** The runnable job entry point, end to end through its main(). */
class ExtractJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark // shared session for main's getOrCreate

  test("ExtractJob.main extracts a mock table into the dated layout") {
    spark.sparkContext.setLogLevel("WARN")
    MockRfcBackend.clear()
    MockRfcBackend.register("ZJOB", MockTable(
      Seq(RfcField("MANDT", "C"), RfcField("DOCNUM", "N")),
      rows = (1 to 4).map(i => Seq("100", i.toString)),
      rawWa = Seq("badrow")))

    val root = Files.createTempDirectory("extract-job-").toString
    ExtractJob.main(Array("ZJOB", root, "parquet"))

    def walk(p: String): Seq[Path] =
      Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .filter(Files.isRegularFile(_)).toSeq
    val files = walk(root).map(_.toString)
    assert(files.exists(f => f.contains("/result/parquet/ZJOB/") &&
      f.endsWith("ZJOB4.parquet")))
    assert(files.exists(f => f.contains("/result-err/parquet/ZJOB/") &&
      f.endsWith("ZJOB-err.parquet")))

    val goodDir = files.find(_.endsWith("ZJOB4.parquet")).get
      .replaceAll("/[^/]+$", "")
    val back = spark.read.parquet(goodDir)
    assert(back.count() == 4)
    assert(back.schema("DOCNUM").dataType.typeName == "long")
  }
}
