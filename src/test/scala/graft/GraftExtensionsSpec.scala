package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SrpBucket
import graft.ops.TrainingData

/** `srp_bucket` registered through the extension point must be reachable
  * from plain SQL and agree with the Column-API route. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("srp_bucket registers and matches the Column API from SQL") {
    GraftExtensions.register(ColumnBridge.registry(spark))
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    Seq.fill(20)(Array.fill(64)(rnd.nextGaussian().toFloat))
      .toDF("embedding").createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql("SELECT srp_bucket(embedding) AS b FROM ext_vecs")
      .as[Int].collect().toSeq
    val viaColumn = spark.table("ext_vecs")
      .select(SrpBucket.bucket(col("embedding"), TrainingData.lshPlanes).as("b"))
      .as[Int].collect().toSeq
    assert(viaSql == viaColumn)
    assert(viaSql.distinct.size > 1) // not degenerate
  }

  test("fix_dot registers and matches the Column API from SQL, " +
    "including the self-dot integer norm") {
    GraftExtensions.register(ColumnBridge.registry(spark))
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    Seq.fill(20)((Array.fill(64)(rnd.nextGaussian().toFloat / 8),
        Array.fill(64)(rnd.nextGaussian().toFloat / 8)))
      .toDF("a", "b").createOrReplaceTempView("ext_fix_vecs")
    val viaSql = spark.sql(
        "SELECT fix_dot(a, b) AS d, fix_dot(a, a) AS n FROM ext_fix_vecs")
      .as[(Long, Long)].collect().toSeq
    val viaColumn = spark.table("ext_fix_vecs")
      .select(graft.functions.FixDot.dot(col("a"), col("b")).as("d"),
        graft.functions.FixDot.normSq(col("a")).as("n"))
      .as[(Long, Long)].collect().toSeq
    assert(viaSql == viaColumn)
    assert(viaSql.forall(_._2 >= 0L))
    assert(viaSql.map(_._1).distinct.size > 1) // not degenerate
  }

  test("html_clean_strict registers and matches the Column API from SQL") {
    GraftExtensions.register(ColumnBridge.registry(spark))
    import spark.implicits._
    Seq("<p>body</p><nav>menu never closes",
        "<a href=\"x>y\">link</a>", "plain & <b>bold</b>")
      .toDF("html").createOrReplaceTempView("ext_html")
    val viaSql = spark.sql(
        "SELECT html_clean_strict(html) AS c FROM ext_html")
      .as[String].collect().toSeq
    val viaColumn = spark.table("ext_html")
      .select(graft.functions.HtmlCleanStrict.clean(col("html")).as("c"))
      .as[String].collect().toSeq
    assert(viaSql == viaColumn)
    assert(viaSql == Seq("body", "link", "plain & bold"))
  }

  test("srp_bucket arity raises Spark's standard WRONG_NUM_ARGS analysis error") {
    GraftExtensions.register(ColumnBridge.registry(spark))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT srp_bucket(array(1.0f), array(1.0f))").collect()
    }
    assert(e.getErrorClass != null && e.getErrorClass.startsWith("WRONG_NUM_ARGS"))
    assert(e.getMessage.contains("srp_bucket"))
  }
}
