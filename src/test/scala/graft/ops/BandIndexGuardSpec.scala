package graft.ops

import org.apache.hadoop.fs.Path

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** `ensureBandIndex`'s crash/race protocol, all three entry paths:
  *
  *  1. fresh build — staged write + atomic rename, `_SUCCESS` present,
  *     table registered EXTERNAL;
  *  2. adopt — a complete directory left by a previous session (table
  *     gone from the in-memory catalog, files on disk) is adopted
  *     as-is, byte-for-byte, with no rebuild;
  *  3. rebuild — an INCOMPLETE leftover (no `_SUCCESS`: a crashed
  *     writer) is cleared and rebuilt.
  *
  * Uses a path alias of the testdata so its index table is disjoint
  * from q107's and from IndexAdmissionSpec's. */
class BandIndexGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val aliasDir = "/root/testdata/./sf0.001"

  private def fs = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def whPath(table: String) =
    new Path(spark.conf.get("spark.sql.warehouse.dir"), table)

  private def fileListing(dir: Path): Seq[(String, Long, Long)] = {
    val it = fs.listFiles(dir, false)
    val b = Seq.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      b += ((st.getPath.getName, st.getLen, st.getModificationTime))
    }
    b.result().sortBy(_._1)
  }

  test("fresh build: staged, committed (_SUCCESS), registered external, " +
    "and no staging debris left behind") {
    val table = Curation.ensureBandIndex(spark, aliasDir)
    val dir = whPath(table)
    assert(fs.exists(new Path(dir, "_SUCCESS")), "build must be committed")
    assert(spark.table(table).count() > 0)
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(cat.tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
      "index must register external so DROP TABLE leaves files to adopt")
    // no *_stg_* staging directory survives a successful build
    val debris = fs.listStatus(dir.getParent)
      .map(_.getPath.getName).filter(_.contains(s"${table}_stg_"))
    assert(debris.isEmpty, s"staging debris: ${debris.mkString(",")}")
  }

  test("adopt: a complete directory from a dead session is reused " +
    "byte-for-byte, not rebuilt") {
    val table = Curation.ensureBandIndex(spark, aliasDir)
    val dir = whPath(table)
    val n = spark.table(table).count()
    val before = fileListing(dir)
    // simulate the next session: catalog entry gone, files remain
    spark.sql(s"DROP TABLE $table")
    assert(fs.exists(dir), "DROP TABLE on the external index ate the files")
    assert(!spark.catalog.tableExists(table))

    val again = Curation.ensureBandIndex(spark, aliasDir)
    assert(again == table)
    assert(fileListing(dir) == before,
      "adoption must not rewrite a single file (names/sizes/mtimes)")
    assert(spark.table(table).count() == n)
  }

  test("rebuild: an incomplete leftover (no _SUCCESS) is cleared and " +
    "rebuilt to the same contents") {
    val table = Curation.ensureBandIndex(spark, aliasDir)
    val dir = whPath(table)
    val n = spark.table(table).count()
    // simulate a writer that died mid-build: drop the commit marker and
    // plant junk the rebuild must clear
    spark.sql(s"DROP TABLE $table")
    fs.delete(new Path(dir, "_SUCCESS"), false)
    val junk = new Path(dir, "part-junk-halfwritten.parquet")
    val out = fs.create(junk)
    out.write(Array.fill[Byte](64)(0x7f)); out.close()

    val again = Curation.ensureBandIndex(spark, aliasDir)
    assert(again == table)
    assert(fs.exists(new Path(dir, "_SUCCESS")), "rebuild must commit")
    assert(!fs.exists(junk), "rebuild must clear the crashed writer's junk")
    assert(spark.table(table).count() == n)
  }

  test("append with a mismatched bucket layout fails loudly instead of " +
    "corrupting the index") {
    val table = Curation.ensureBandIndex(spark, aliasDir)
    val rows = spark.table(table).limit(1)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      // wrong bucket count: Spark must reject, never mix layouts
      graft.sink.BucketedTables.append(rows, table, 4,
        Seq("band", "k1", "k2"))
    }
    assert(e.getMessage.toLowerCase.contains("bucket"), e.getMessage)
  }

  test("a lost rename race that copied the staging dir INSIDE the live " +
    "table (RawLocalFileSystem move-into-dest) is swept, not scanned") {
    val table = Curation.ensureBandIndex(spark, aliasDir)
    val dir = whPath(table)
    val n = spark.table(table).count()
    // reproduce the hazard with Hadoop's own rename: a loser's staged
    // build renamed onto an EXISTING destination dir is treated as
    // move-into-parent — rename returns true, the staging dir nests
    // inside the live table, and its parquet would double-count
    val stg = s"${table}_stg_racespec"
    graft.sink.BucketedTables.save(spark.table(table), stg, 8,
      Seq("band", "k1", "k2"))
    val stgPath = whPath(stg)
    assert(fs.rename(stgPath, dir),
      "precondition: RawLocalFileSystem rename into an existing dest " +
        "reports success (the hazard under test)")
    val nested = new Path(dir, stg)
    assert(fs.exists(nested), "precondition: staging dir nested inside")
    // (the non-partitioned catalog scan happens to ignore subdirs, so
    // rows don't double-count TODAY — but the loser took the winner
    // path with its completeness check never run, and the debris is one
    // recursive-listing config away from surfacing; sweep regardless)

    graft.sink.BucketedTables.sweepNestedStaging(fs, dir)
    spark.sql(s"DROP TABLE IF EXISTS $stg")
    spark.sql(s"REFRESH TABLE $table")
    assert(!fs.exists(nested), "sweep must delete the nested staging dir")
    assert(fs.exists(new Path(dir, "_SUCCESS")))
    assert(spark.table(table).count() == n,
      "after the sweep the table must scan exactly the winner's build")
  }

  test("stale-version leftover (complete but wrong schema) is rebuilt, " +
    "not adopted") {
    val table = Curation.ensureBandIndex(spark, aliasDir)
    val dir = whPath(table)
    val n = spark.table(table).count()
    spark.sql(s"DROP TABLE $table")
    // a COMPLETE directory (committed _SUCCESS) whose schema drifted —
    // what an older engine version's files look like to a newer one
    fs.delete(dir, true)
    spark.range(5).selectExpr("id AS wrong_col").write.parquet(dir.toString)
    assert(fs.exists(new Path(dir, "_SUCCESS")))

    val again = Curation.ensureBandIndex(spark, aliasDir)
    assert(again == table)
    assert(spark.table(table).columns.toSeq ==
      Seq("o_doc", "band", "k1", "k2"),
      "drifted files must not be adopted under the current schema")
    assert(spark.table(table).count() == n)
  }
}
