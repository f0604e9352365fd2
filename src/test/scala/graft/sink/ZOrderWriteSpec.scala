package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Z-order must deliver what single-key clustering can't: file-level
  * min/max pruning on BOTH dimensions. We write a 128×128 grid twice —
  * x-sorted ([[ClusteredWrite]]) and z-ordered — and compare how many
  * files a band predicate on the SECOND dimension intersects. */
class ZOrderWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def fileRanges(path: String): Array[(Long, Long)] = {
    import org.apache.spark.sql.Row
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("y").as("ylo"), max("y").as("yhi"))
      .collect().map { case Row(_, lo: Long, hi: Long) => (lo, hi) }
  }

  test("morton code interleaves bits exactly") {
    val df = spark.range(1).select(
      ZOrderWrite.zvalue(lit(0), lit(0)).as("z00"),
      ZOrderWrite.zvalue(lit(1), lit(0)).as("z10"),
      ZOrderWrite.zvalue(lit(0), lit(1)).as("z01"),
      ZOrderWrite.zvalue(lit(3), lit(5)).as("z35"),
      ZOrderWrite.zvalue(lit(0xFFFFFFFFL), lit(0xFFFFFFFFL)).as("zmax"))
    val r = df.head
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 1L)     // a → even bits
    assert(r.getLong(2) == 2L)     // b → odd bits
    // a=3 (0b011) even bits → 0b000101 = 5; b=5 (0b101) odd bits
    // → 0b100010 = 34; z = 39
    assert(r.getLong(3) == 39L)
    assert(r.getLong(4) == -1L)    // all 64 bits set
  }

  test("z-ordered files prune on the second dimension; x-sorted can't") {
    import spark.implicits._
    val grid = spark.range(128L * 128)
      .select((col("id") / 128).cast("long").as("x"),
        (col("id") % 128).cast("long").as("y"))

    val xDir = Files.createTempDirectory("xsort-").toString
    val zDir = Files.createTempDirectory("zord-").toString
    ClusteredWrite.parquet(grid, xDir, 16, col("x"))
    ZOrderWrite.parquet(grid, zDir, 16, col("x"), col("y"))

    // band query on y (the non-cluster key for the x layout):
    // files whose [ymin, ymax] intersects y ≤ 7
    val xHits = fileRanges(xDir).count(_._1 <= 7)
    val zHits = fileRanges(zDir).count(_._1 <= 7)
    // x-sorted: every file spans the full y range → zero pruning
    assert(xHits == 16, s"x-layout unexpectedly pruned: $xHits")
    // z-ordered: only the bottom row of z-quadrants touches the band
    // (4 of 16 at exact boundaries; ≤ 6 with sampling-skewed ranges)
    assert(zHits <= 6, s"z-layout pruned too little: $zHits of 16")

    // and the layout change loses nothing
    assert(spark.read.parquet(zDir).count() == 128L * 128)
    assert(spark.read.parquet(zDir)
      .filter($"y" <= 7).count() == 128L * 8)
  }

  test("full-width keys don't wrap: files stay range-disjoint when the " +
    "Morton code's sign bit is set (the signed/unsigned ordering trap)") {
    import org.apache.spark.sql.Row
    // a = 0 constant, b spans the FULL 32-bit range → z is monotone in b
    // and half the z values have bit 63 set (negative as signed longs);
    // without the sign-bit flip one file would straddle the wrap and
    // cover both ends of the b range
    val step = (1L << 32) / 4096
    val data = spark.range(4096)
      .select(lit(0L).as("a"), (col("id") * step).as("b"))
    val dir = Files.createTempDirectory("zwrap-").toString
    ZOrderWrite.parquet(data, dir, 8, col("a"), col("b"))

    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("b").as("lo"), max("b").as("hi"))
      .collect().map { case Row(_, lo: Long, hi: Long) => (lo, hi) }
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"overlapping file b-ranges: ${ranges.toSeq}")
      case _ =>
    }
  }
}
