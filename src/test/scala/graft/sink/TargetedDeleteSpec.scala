package graft.sink

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** Targeted delete: pruning binds (most files untouched — and
  * untouched means BYTE-identical, the compliance claim), the keys are
  * gone, every other row survives, and the no-actual-hit bounding-box
  * case rewrites nothing. */
class TargetedDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def md5(p: java.nio.file.Path): String =
    MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
      .map("%02x".format(_)).mkString

  private def fileHashes(dir: String): Map[String, String] = {
    val d = Paths.get(dir)
    Files.list(d).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> md5(p)).toMap
  }

  private def freshTable(): String = {
    val out = Files.createTempDirectory("graft-tdel-").toString
    ClusteredWrite.parquet(
      T(spark, SparkTestBase.Sf0001, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      out, 8, col("o_custkey"))
    out
  }

  test("delete removes exactly the key's rows; pruning leaves other " +
    "files byte-identical") {
    val out = freshTable()
    val before = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val custs = before.map(_._2).toSeq.sorted
    val victim = custs(custs.size / 2)
    val hashesBefore = fileHashes(out)

    val rep = TargetedDelete.deleteKeys(spark, out, "o_custkey",
      Seq(victim))
    assert(rep.rowsDeleted == before.count(_._2 == victim).toLong)
    assert(rep.filesRewritten >= 1)
    assert(rep.filesAffected < rep.filesTotal,
      "footer pruning must exclude most files")

    val after = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before.filterNot(_._2 == victim))

    val hashesAfter = fileHashes(out)
    val unchanged = hashesAfter.count { case (n, h) =>
      hashesBefore.get(n).contains(h)
    }
    assert(unchanged == rep.filesTotal - rep.filesRewritten)
  }

  test("r13: the graded q231 row equals the direct complement filter " +
    "on raw orders, the fixture genuinely deleted rows, and re-reads " +
    "are stable (the bench-reps contract)") {
    import org.apache.spark.sql.functions._
    val dir = SparkTestBase.Sf0001
    val got = DeleteQueries.q231TargetedDelete(spark, dir).collect()
    val direct = T(spark, dir, "orders")
      .filter(col("o_orderkey") % 1000 =!= 0)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus").collect()
    assert(got.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
    // the delete was not vacuous: raw row count strictly exceeds the
    // post-delete count
    val raw = T(spark, dir, "orders").count()
    assert(got.map(_.getLong(1)).sum < raw, "fixture must delete rows")
    val again = DeleteQueries.q231TargetedDelete(spark, dir).collect()
    assert(again.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq)
  }

  test("crash between the two swap renames heals: the backup restores " +
    "and a re-run completes the delete") {
    val out = freshTable()
    val before = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val custs = before.map(_._2).toSeq.sorted
    val victim = custs(custs.size / 3)

    // simulate the worst crash point: a file was moved to .bak and the
    // staged part never swapped in — the table has a hole
    val dir = Paths.get(out)
    val someFile = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.head
    val bak = dir.resolve("." + someFile.getFileName.toString + ".bak")
    Files.move(someFile, bak)
    val staged = dir.resolve(
      "." + someFile.getFileName.toString + ".staged")
    Files.createDirectory(staged)
    Files.write(staged.resolve("junk"), Array[Byte](1, 2, 3))

    val rep = TargetedDelete.deleteKeys(spark, out, "o_custkey",
      Seq(victim))
    // recovery restored the backup BEFORE the delete ran, so the final
    // state is exactly "victim gone, everything else intact"
    val after = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before.filterNot(_._2 == victim))
    assert(rep.rowsDeleted == before.count(_._2 == victim).toLong)
    assert(!Files.exists(bak) && !Files.exists(staged))
  }

  test("a bounding-box match with no actual rows rewrites nothing") {
    // write the table WITHOUT one mid-range custkey: the footer ranges
    // of its neighbors' file(s) still bound the ghost (min/max is a
    // bounding box, not a membership proof), but no row matches
    val out = Files.createTempDirectory("graft-tdel-").toString
    val ghost = 75L
    ClusteredWrite.parquet(
      T(spark, SparkTestBase.Sf0001, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(col("o_custkey") =!= ghost),
      out, 8, col("o_custkey"))
    val hashesBefore = fileHashes(out)
    val rep = TargetedDelete.deleteKeys(spark, out, "o_custkey",
      Seq(ghost))
    assert(rep.rowsDeleted == 0 && rep.filesRewritten == 0)
    assert(fileHashes(out) == hashesBefore)
  }
}
