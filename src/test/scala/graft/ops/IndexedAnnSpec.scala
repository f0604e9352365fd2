package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q152 — the persisted-IVF-index ANN path. Four contracts:
  *
  *  1. output identity: probing the persisted index returns exactly
  *     q93's rows (same oracle drives both in CORRECTNESS);
  *  2. plan shape: a probe touches ONLY the index tables — the
  *     embeddings parquet is never rescanned per query;
  *  3. adoption: a catalog that lost its entries (fresh session)
  *     adopts the complete on-disk index WITHOUT retraining the
  *     quantizer (the build thunk never runs — the per-JVM ivfCache
  *     stays empty for the adopted dataset);
  *  4. admission: new vectors appended through the persisted centroids
  *     become visible to the next probe, with the q107-style
  *     cross-session refreshTable contract.
  */
class IndexedAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("q152 equals q93 row-for-row") {
    val expected = TrainingData.q93AnnIvf(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    val got = TrainingData.q152IndexedAnn(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("the probe plan reads only the index tables — no embeddings rescan") {
    // static plan inspection: AQE would hide the scans in query stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      TrainingData.q152IndexedAnn(spark, SparkTestBase.Sf0001)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    assert(scans.nonEmpty)
    val files = scans.flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(files.forall(p => p.contains("graft_ivf3_")),
      s"probe scans a non-index path: $files")
    assert(scans.exists(_.relation.bucketSpec.nonEmpty),
      "inverted file lost its bucket layout")
  }

  /** Clears an alias's index tables from catalog AND disk, so a test
    * that asserts on build/adopt behavior starts pristine even though
    * the warehouse outlives test JVMs. */
  private def resetIndex(aliasDir: String): Unit = {
    TrainingData.ivfCache.remove(aliasDir)
    val (cents, cells) = TrainingData.ivfIndexNames(aliasDir)
    Seq(cents, cells).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(wh, true)
    }
    TrainingData.ivfCache.remove(aliasDir)
  }

  test("a fresh catalog adopts the on-disk index without retraining") {
    val aliasDir = SparkTestBase.Sf0001 + "/." // own digest, own tables
    resetIndex(aliasDir)
    val first = TrainingData.q152IndexedAnn(spark, aliasDir)
      .collect().map(_.toSeq).toSeq
    assert(TrainingData.ivfCache.contains(aliasDir),
      "the initial build should have trained through the cache")

    // simulate a fresh session: catalog entries gone, files remain,
    // per-JVM cache empty for this dataset
    TrainingData.ivfCache.remove(aliasDir)
    val (cents, cells) = TrainingData.ensureIvfIndex(spark, aliasDir)
    spark.sql(s"DROP TABLE $cents")
    spark.sql(s"DROP TABLE $cells")

    val again = TrainingData.q152IndexedAnn(spark, aliasDir)
      .collect().map(_.toSeq).toSeq
    assert(again == first)
    assert(!TrainingData.ivfCache.contains(aliasDir),
      "adoption retrained the quantizer — ensureLazy evaluated its " +
        "build thunk on the adopt path")
  }

  test("admission: appended vectors are visible to the next probe, and " +
    "a second session sees them only after refreshTable") {
    val dir = SparkTestBase.Sf0001 + "/./" // own tables; this test appends
    resetIndex(dir)
    val (cents, cells) = TrainingData.ensureIvfIndex(spark, dir)
    val before = spark.table(cells).count()

    // session B resolves the index pre-append (the q107 contract twin)
    val sessionB = spark.newSession()
    assert(sessionB.table(cells).count() == before)

    val newVecs = T(spark, dir, "embeddings")
      .filter(col("vec_id") % 50 === 1)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val n = newVecs.count()
    assert(n > 0)
    TrainingData.admitToIvfIndex(spark, cents, cells, newVecs)

    assert(spark.table(cells).count() == before + n)
    assert(sessionB.table(cells).count() == before,
      "session B saw the append without refreshTable — the documented " +
        "contract (and this test) are stale")
    sessionB.catalog.refreshTable(cells)
    assert(sessionB.table(cells).count() == before + n)

    // each admitted copy finds its original as the exact-duplicate
    // top hit through the index alone
    val probes = spark.table(cells).filter(col("vec_id") >= 1000000L)
      .select(col("vec_id"), col("embedding"), col("nrm"))
    val hits = TrainingData.probeIvfIndex(spark, cents, cells, probes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    newVecs.select("vec_id").collect().map(_.getLong(0)).foreach { qid =>
      val top = hits.filter(h => h._1 == qid && h._4 == 1)
      assert(top.length == 1 && top.head._2 == qid - 1000000L
        && top.head._3 == 1.0,
        s"admitted copy $qid did not find its original as the top hit: " +
          top.mkString(","))
    }
  }
}
