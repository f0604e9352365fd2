package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q161 (JSONL ingest) beyond the DuckDB oracle: field-level
  * round-trip fidelity for parsed rows, the corrupt bucket carrying
  * the raw offending line, and the explicit-schema contract.
  */
class JsonlIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("parsed rows round-trip every field bit-exactly and the corrupt " +
    "bucket is exactly the injected truncations with the raw line " +
    "preserved") {
    val back = JsonlIngest.readBack(spark, dir)
    val good = back.filter(col("_corrupt").isNull)
      .select("doc_id", "text", "lang", "source")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    val (corruptIds, okIds) = orig.keySet.partition(_ % 37 == 0)
    assert(good.keySet == okIds)
    good.foreach { case (id, v) => assert(v == orig(id), s"doc $id") }

    val bad = back.filter(col("_corrupt").isNotNull)
      .select("_corrupt", "doc_id", "text").collect()
    assert(bad.length == corruptIds.size && corruptIds.nonEmpty)
    bad.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2),
        "PERMISSIVE must null parsed fields on a corrupt line")
      val line = r.getString(0)
      assert(line.length == 12 && line.startsWith("{\"doc_id\":"),
        s"unexpected corrupt payload: $line")
    }
  }

  test("the read uses the explicit schema (no inference) and parses " +
    "with the documented column set") {
    val back = JsonlIngest.readBack(spark, dir)
    assert(back.schema == JsonlIngest.schema)
  }
}
