package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The `graft-avro` DSv2 connector (q192's substrate): round-trip
  * fidelity across the full supported type matrix, header-derived
  * schema inference, reader-schema column pruning visible in the plan,
  * overwrite-truncate semantics, and null round-trip. */
class AvroSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(): String =
    Files.createTempDirectory("graft-avro-spec-").toString

  test("orders round-trip is row-identical (content, not just counts)") {
    val src = graft.ops.T(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
    val out = tmp()
    src.write.format("graft-avro").mode("overwrite").save(out)
    val back = spark.read.format("graft-avro").load(out)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)),
      "inferred schema drifted from the written frame")
    val a = src.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b, "round-trip changed row content")
  }

  test("full type matrix round-trips exactly, including nulls") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("tsn", TimestampNTZType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, true, "héllo, \"quoted\"",
        Array[Byte](0, 1, -1), java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456"),
        java.time.LocalDateTime.parse("2024-02-29T23:59:59.000001")),
      Row(null, null, null, null, null, null, null, null, null, null))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = tmp()
    src.write.format("graft-avro").mode("overwrite").save(out)
    val back = spark.read.format("graft-avro").load(out)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.orderBy(col("l").asc_nulls_last).collect().toSeq
    val want = src.orderBy(col("l").asc_nulls_last).collect().toSeq
    // Row.equals compares binary by reference — compare field-wise
    got.zip(want).foreach { case (g, w) =>
      (0 until schema.length).foreach { i =>
        (g.get(i), w.get(i)) match {
          case (x: Array[Byte], y: Array[Byte]) =>
            assert(java.util.Arrays.equals(x, y), s"binary field $i")
          case (x, y) => assert(x == y, s"field ${schema(i).name}")
        }
      }
    }
  }

  test("column pruning pushes a reader schema: the scan decodes only " +
    "the referenced fields") {
    val out = tmp()
    graft.ops.T(spark, dir, "orders").write.format("graft-avro")
      .mode("overwrite").save(out)
    val q = spark.read.format("graft-avro").load(out)
      .select("o_orderkey", "o_orderstatus")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "no DSv2 scan in the plan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("o_orderkey", "o_orderstatus"),
      s"scan decodes ${scans.head.scan.readSchema().fieldNames.toSeq}")
  }

  test("overwrite truncates: stale container files do not survive a " +
    "second write") {
    import spark.implicits._
    val out = tmp()
    Seq(1L, 2L, 3L).toDF("v").repartition(3)
      .write.format("graft-avro").mode("overwrite").save(out)
    Seq(10L).toDF("v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(out)
    val back = spark.read.format("graft-avro").load(out)
    assert(back.as[Long].collect().toSeq == Seq(10L))
    // append keeps existing files
    Seq(11L).toDF("v").coalesce(1)
      .write.format("graft-avro").mode("append").save(out)
    assert(spark.read.format("graft-avro").load(out)
      .as[Long].collect().sorted.toSeq == Seq(10L, 11L))
    // r13 job-commit swap hygiene: after the overwrites, the directory
    // holds only final-named containers + _SUCCESS — no .inprogress
    // residue from the truncate path's staged task commits
    val names = new java.io.File(out).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".inprogress")),
      s"staging residue in $out: ${names.mkString(",")}")
  }

  test("r13 generation pointer: a hard-crashed truncate attempt " +
    "(published containers, no pointer flip) leaves the OLD dataset " +
    "fully readable — no crash point shows duplicates or loses both") {
    import spark.implicits._
    val out = tmp()
    Seq(1L, 2L).toDF("v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(out)
    // the committed dataset lives under a generation token now
    val dir = new java.io.File(out)
    assert(new java.io.File(dir, "_generation").exists(), "pointer")
    // simulate a truncate job that crashed AFTER its task commits
    // published containers but BEFORE the job-commit pointer flip: a
    // full *.avro file under a token no pointer names (standard token
    // format, OLDER millis prefix — the r14 sweep is scoped to
    // strictly-older generations so a concurrent newer one is never
    // destroyed), plus a long-stale staging orphan — both invisible
    val stray = new java.io.File(dir,
      "gen-0000000000001-deadbeef-part-00000-9-ffff.avro")
    java.nio.file.Files.write(stray.toPath, Array[Byte](1, 2, 3))
    val staged = new java.io.File(dir, ".part-99999-0-dead.avro.inprogress")
    java.nio.file.Files.write(staged.toPath, Array[Byte](1, 2, 3))
    staged.setLastModified(System.currentTimeMillis() - 25L * 3600 * 1000)
    assert(spark.read.format("graft-avro").load(out)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "old generation must stay intact; unflipped tokens invisible")
    // the NEXT successful truncate sweeps the crashed attempt's garbage
    Seq(9L).toDF("v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(out)
    assert(spark.read.format("graft-avro").load(out)
      .as[Long].collect().toSeq == Seq(9L))
    assert(!stray.exists() && !staged.exists(), "garbage swept")
    // appends join the current generation and stay visible
    Seq(10L).toDF("v").coalesce(1)
      .write.format("graft-avro").mode("append").save(out)
    assert(spark.read.format("graft-avro").load(out)
      .as[Long].collect().sorted.toSeq == Seq(9L, 10L))
  }

  test("r14 concurrent-truncate discipline: a truncate's sweep never " +
    "deletes a NEWER published-but-unflipped generation, and a truncate " +
    "that lost the race to a newer committed one fails loudly") {
    import spark.implicits._
    val out = tmp()
    Seq(1L).toDF("v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(out)
    val dir = new java.io.File(out)
    // a concurrent truncate T2 that published its generation (NEWER
    // token than anything this clock will mint) but has not flipped yet
    val newer = new java.io.File(dir,
      "gen-zzzzzzzzzzzzz-cafecafe-part-00000-0-aaaa.avro")
    java.nio.file.Files.write(newer.toPath, Array[Byte](1, 2, 3))
    // T1 truncates: the r13 sweep (delete everything not mine) would
    // destroy T2's files here; the r14 scoped sweep must keep them
    Seq(2L).toDF("v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(out)
    assert(newer.exists(),
      "sweep deleted a newer generation's published files (the r13 race)")
    assert(spark.read.format("graft-avro").load(out)
      .as[Long].collect().toSeq == Seq(2L),
      "unflipped newer generation must stay invisible to readers")
    // now the pointer names the NEWER token (T2's flip won): any
    // truncate minting an older token must refuse to un-flip it
    locally { // hadoop FS write (a raw java.nio write desyncs the .crc)
      val hp = new org.apache.hadoop.fs.Path(out, "_generation")
      val hfs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val o = hfs.create(hp, true)
      try o.write("zzzzzzzzzzzzz-cafecafe".getBytes("UTF-8")) finally o.close()
    }
    val e = intercept[Exception] {
      Seq(3L).toDF("v").coalesce(1)
        .write.format("graft-avro").mode("overwrite").save(out)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("lost the race")),
      s"expected the loud losing-truncate error, got: ${messages(e)}")
    // the winner's pointer and files are untouched by the loser
    assert(newer.exists())
    assert(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_generation").toPath), "UTF-8").trim ==
      "zzzzzzzzzzzzz-cafecafe")
  }

  test("schema evolution on read: files written BEFORE a column was " +
    "added resolve it to NULL, in EITHER sort order (merged headers, " +
    "not first-file inference)") {
    import spark.implicits._
    def build(renameOldTo: Option[String]): Seq[(Long, Option[Any])] = {
      val out = tmp()
      // old-layout file (v only) written first — the NATURAL append
      // order, where the narrow file sorts first
      Seq((1L, "zz")).toDF("v", "tag").drop("tag").coalesce(1)
        .write.format("graft-avro").mode("append").save(out)
      renameOldTo.foreach { n =>
        val narrow = new java.io.File(out).listFiles()
          .filter(_.getName.endsWith(".avro")).head
        assert(narrow.renameTo(new java.io.File(out, n)))
      }
      // new-layout file (v + added)
      Seq((2L, "new")).toDF("v", "added").coalesce(1)
        .write.format("graft-avro").mode("append").save(out)
      spark.read.format("graft-avro").load(out)
        .select("v", "added").orderBy("v").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    }
    val want = Seq((1L, None), (2L, Some("new")))
    assert(build(None) == want, "natural order (narrow sorts first)")
    assert(build(Some("part-zz-old.avro")) == want,
      "forced order (wide sorts first)")
  }

  test("conflicting types for one column across containers fail " +
    "loudly, never silently re-type") {
    import spark.implicits._
    val out = tmp()
    Seq(1L).toDF("v").coalesce(1)
      .write.format("graft-avro").mode("append").save(out)
    Seq("s").toDF("v").coalesce(1)
      .write.format("graft-avro").mode("append").save(out)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-avro").load(out).collect()
    }
    assert(e.getMessage.contains("conflicting types"))
  }

  test("an empty-projection count(*) still counts every row") {
    val out = tmp()
    graft.ops.T(spark, dir, "orders").write.format("graft-avro")
      .mode("overwrite").save(out)
    assert(spark.read.format("graft-avro").load(out).count() ==
      graft.ops.T(spark, dir, "orders").count())
  }
}
