package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** q177 schema evolution: the merged read unions the two footer
  * schemas, NULL-backfills the old generation, and loses no row; the
  * new column's values survive byte-exactly; a plain read of one
  * batch reflects that batch's own footer (the evolution lives in the
  * files, not in session state). */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val path =
    SchemaEvolution.ensureEvolvedDocs(spark, SparkTestBase.Sf0001)

  test("merged schema is the union; old generation reads NULL quality") {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    assert(df.columns.toSet ==
      Set("doc_id", "lang", "n_chars", "quality", "batch"))
    val nulls = df.filter(col("batch") === 1)
      .filter(col("quality").isNotNull).count()
    assert(nulls == 0)
    val filled = df.filter(col("batch") === 2)
      .filter(col("quality").isNull).count()
    assert(filled == 0)
  }

  test("no row lost, no quality value invented") {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val raw = T(spark, SparkTestBase.Sf0001, "documents")
    assert(df.count() == raw.count())
    val got = df.filter(col("quality").isNotNull)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = raw.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), (col("n_chars") * 10).as("q")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("a non-merged single-batch read sees its own footer schema") {
    val b2 = spark.read.parquet(s"$path/batch=2")
    assert(b2.columns.contains("quality"))
    val b1 = spark.read.parquet(s"$path/batch=1")
    assert(!b1.columns.contains("quality"))
  }
}
