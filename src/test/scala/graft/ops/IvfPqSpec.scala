package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q195 (IVFPQ) beyond the DuckDB oracle: brute-force parity of the
  * composed pipeline (cells × codes × integer ADC) on sf0.001, and the
  * index contract — a probe's plan touches ONLY the three persisted
  * index tables (centroids, inverted file, codes), never the
  * embeddings parquet. */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 65536.0 + 0.5).toLong)
  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def sub(v: Array[Long], m: Int): Array[Long] =
    v.slice(m * 8, m * 8 + 8)

  test("q195 equals the driver-side brute force over cells, codes and " +
    "integer ADC") {
    // ground truth assignment + probe slice from the op's own ranked
    // assignment (itself pinned by IvfTrainSpec/SemanticDedupSpec) —
    // what this test adds is the CODES path and the composition
    val assign = TrainingData.ivfAssign(spark, dir, 4).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(3),
        r.getInt(4)))
    val cellOf = assign.filter(_._4 == 1).map(r => r._1 -> r._3).toMap
    val vecs = assign.filter(_._4 == 1)
      .map(r => r._1 -> quant(r._2)).toMap
    val cb = Array.tabulate(8)(m => Array.tabulate(16)(k =>
      sub(vecs(k.toLong), m)))
    def codesOf(v: Array[Long]): Array[Int] =
      Array.tabulate(8)(m => (0 until 16).minBy(k => (d2(sub(v, m), cb(m)(k)), k)))
    val expect = assign.filter(r => r._1 % 50 == 0).groupBy(_._1)
      .flatMap { case (qid, rows) =>
        val probed = rows.map(_._3).toSet
        val qv = vecs(qid)
        val scored = vecs.toSeq
          .filter { case (c, _) => c != qid && probed.contains(cellOf(c)) }
          .map { case (c, cv) =>
            val codes = codesOf(cv)
            (c, (0 until 8).map(m => d2(sub(qv, m), cb(m)(codes(m)))).sum)
          }
          .sortBy { case (c, adc) => (adc, c) }.take(3)
        scored.zipWithIndex.map { case ((c, adc), i) => (qid, i + 1, c, adc) }
      }.toSet
    val got = TrainingData.q195IvfPqAdc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("IVFPQ admission: an admitted duplicate is ADC-distance-0 from " +
    "its original and lands in both index tables") {
    val alias = dir + "/.." + "/" + dir.split('/').last + "/" // own digest
    // pristine per-run state for all three tables
    TrainingData.ivfCache.remove(alias)
    val (cents0, cells0) = TrainingData.ivfIndexNames(alias)
    Seq(cents0, cells0, TrainingData.ivfCodesName(alias)).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(wh, true)
    }
    TrainingData.q195IvfPqAdc(spark, alias).collect() // build the triple
    val codesTable = TrainingData.ivfCodesName(alias)
    val (_, cellsTable) = TrainingData.ivfIndexNames(alias)
    val beforeCells = spark.table(cellsTable).count()
    val beforeCodes = spark.table(codesTable).count()
    assert(beforeCells == beforeCodes)

    import org.apache.spark.sql.functions.col
    val newVecs = T(spark, alias, "embeddings")
      .filter(col("vec_id") % 97 === 3)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val n = newVecs.count()
    assert(n > 0)
    TrainingData.admitToIvfPqIndex(spark, alias, newVecs)
    assert(spark.table(cellsTable).count() == beforeCells + n)
    assert(spark.table(codesTable).count() == beforeCodes + n)
    // an admitted copy carries its original's codes exactly (same
    // quantization, same codebook), so its ADC to the original's
    // reconstruction is the original's own — spot-check code equality
    val orig = spark.table(codesTable)
      .filter(col("vec_id") % 97 === 3 && col("vec_id") < 2000000L)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val admitted = spark.table(codesTable)
      .filter(col("vec_id") >= 2000000L)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => (r.getLong(0) - 2000000L) -> r.getSeq[Int](1)).toMap
    assert(admitted.nonEmpty && admitted.forall { case (id, c) =>
      orig.get(id).contains(c)
    }, "admitted codes diverged from the originals'")

    // the OTHER admission path (cells-only admitToIvfIndex) must keep
    // the codes table in lockstep via the sync — a cells append with
    // no codes rows would be permanent q195 recall loss
    val (centsT, _) = TrainingData.ivfIndexNames(alias)
    val more = T(spark, alias, "embeddings")
      .filter(col("vec_id") % 97 === 5)
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
    val m = more.count()
    assert(m > 0)
    TrainingData.admitToIvfIndex(spark, centsT, cellsTable, more)
    assert(spark.table(cellsTable).count() == beforeCells + n + m)
    assert(spark.table(codesTable).count() == beforeCodes + n + m,
      "cells-only admission desynced the codes table")
    // and the sync is idempotent: running it again appends nothing
    TrainingData.syncIvfPqCodes(spark, cellsTable)
    assert(spark.table(codesTable).count() == beforeCodes + n + m)
  }

  test("the q195 probe plan reads only the three index tables") {
    TrainingData.q195IvfPqAdc(spark, dir).collect() // ensure built
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      TrainingData.q195IvfPqAdc(spark, dir)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    assert(scans.nonEmpty)
    val files = scans.flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(files.forall(p => p.contains("graft_ivf3_")),
      s"probe scans a non-index path: $files")
    assert(files.exists(_.contains("graft_ivf3_codes_")),
      "probe does not read the codes table")
  }
}
