package graft.sink

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** Vacuum: everything the graded q250 aggregate cannot see — the
  * pre-sweep directory read genuinely differs (the orphan IS
  * read-visible), live files stay byte-identical, hidden artifacts are
  * gone from disk, replay is a no-op, a mid-swap `.bak` heals instead
  * of being swept, and both safety guards refuse loudly. */
class VacuumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def md5(p: java.nio.file.Path): String =
    MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
      .map("%02x".format(_)).mkString

  private def parquetHashes(dir: String): Map[String, String] = {
    val d = Paths.get(dir)
    Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map(p => p.getFileName.toString -> md5(p)).toMap
  }

  private def names(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSet

  /** A fresh 8-file clustered orders table plus its manifest — the
    * fixture shape q250 uses, NOT the shared memoized one (these tests
    * mutate). */
  private def freshTable(): (String, String) = {
    val out = Files.createTempDirectory("graft-vacspec-").toString
    ClusteredWrite.parquet(
      T(spark, SparkTestBase.Sf0001, "orders"), out, 8, col("o_orderkey"))
    val man = Files.createTempDirectory("graft-vacspec-man-").toString
    spark.read.parquet(out)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"))
      .coalesce(1).write.mode("overwrite").parquet(man)
    (out, man)
  }

  test("orphan data file is read-visible before the sweep and gone after; " +
    "live files stay byte-identical; hidden artifacts removed") {
    val (out, man) = freshTable()
    val cleanCount = spark.read.parquet(out).count()
    val liveHashes = parquetHashes(out)

    Vacuum.injectGarbage(spark, out,
      T(spark, SparkTestBase.Sf0001, "orders")
        .filter(col("o_orderkey") % 37 === 0))
    val orphanRows = T(spark, SparkTestBase.Sf0001, "orders")
      .filter(col("o_orderkey") % 37 === 0).count()
    assert(orphanRows > 0, "fixture must plant a non-empty orphan")
    // the correctness hazard: a plain directory read double-counts
    assert(spark.read.parquet(out).count() == cleanCount + orphanRows)
    assert(names(out).exists(_.contains("orphan")))
    assert(names(out).contains(".part-00000.parquet.staged"))
    assert(names(out).contains("_temporary"))

    val rep = Vacuum.sweep(spark, out, man)
    assert(rep.filesLive == 8)
    assert(rep.orphansDeleted == 1)
    // the .staged dir is consumed by the recover() heal pass (it IS a
    // TargetedDelete crash artifact); the sweep itself finds _temporary
    assert(rep.artifactsDeleted == 1)
    assert(rep.backupsHealed == 0)

    assert(spark.read.parquet(out).count() == cleanCount)
    assert(!names(out).exists(_.contains("orphan")))
    assert(!names(out).contains(".part-00000.parquet.staged"))
    assert(!names(out).contains("_temporary"))
    assert(parquetHashes(out) == liveHashes,
      "vacuum must not touch a byte of any live file")
  }

  test("replay is a no-op") {
    val (out, man) = freshTable()
    Vacuum.injectGarbage(spark, out,
      T(spark, SparkTestBase.Sf0001, "orders").limit(5))
    Vacuum.sweep(spark, out, man)
    val after = names(out)
    val rep2 = Vacuum.sweep(spark, out, man)
    assert(rep2.orphansDeleted == 0 && rep2.artifactsDeleted == 0)
    assert(names(out) == after)
  }

  test("a .bak whose original is missing heals back to live — never swept") {
    val (out, man) = freshTable()
    val fs = new Path(out).getFileSystem(spark.sessionState.newHadoopConf())
    val victim = parquetHashes(out).keys.head
    // simulate a crash between TargetedDelete's two renames
    assert(fs.rename(new Path(out, victim), new Path(out, s".$victim.bak")))
    val rep = Vacuum.sweep(spark, out, man)
    assert(rep.backupsHealed == 1)
    assert(names(out).contains(victim), "backup must heal to its original name")
    assert(!names(out).contains(s".$victim.bak"))
    // table reads whole again
    assert(spark.read.parquet(out).count() ==
      T(spark, SparkTestBase.Sf0001, "orders").count())
  }

  test("safety guards: empty manifest and mismatched manifest both refuse") {
    val (out, man) = freshTable()
    import spark.implicits._
    val emptyMan = Files.createTempDirectory("graft-vacspec-empty-").toString
    Seq.empty[String].toDF("file")
      .coalesce(1).write.mode("overwrite").parquet(emptyMan)
    assertThrows[IllegalArgumentException] {
      Vacuum.sweep(spark, out, emptyMan)
    }
    val wrongMan = Files.createTempDirectory("graft-vacspec-wrong-").toString
    Seq("file:///nonexistent/part-does-not-exist.parquet").toDF("file")
      .coalesce(1).write.mode("overwrite").parquet(wrongMan)
    assertThrows[IllegalArgumentException] {
      Vacuum.sweep(spark, out, wrongMan)
    }
    // nothing was deleted by either refusal
    assert(spark.read.parquet(out).count() ==
      T(spark, SparkTestBase.Sf0001, "orders").count())
    val _ = man
  }

  test("q250 graded read equals the raw table after garbage + sweep") {
    val got = graft.SparkEntry.queries("q250_vacuum")(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = T(spark, SparkTestBase.Sf0001, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }
}
