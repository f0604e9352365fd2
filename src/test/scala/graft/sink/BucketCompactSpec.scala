package graft.sink

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[BucketedTables.compact]]: appends erode the one-file-per-bucket
  * layout (each append adds a file per bucket, and multi-file buckets
  * lose the pre-sorted property, so joins re-grow their Sort nodes);
  * compaction must restore exactly one file per bucket, preserve the
  * rows bit-for-bit, drop the join's Sorts again, and leave no staging
  * or backup debris. Plus the crash-recovery entry: a compaction that
  * died between the two swap renames (live dir gone, data in backup)
  * must be restored and finished by the next compact(). */
class BucketCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def wh(table: String) =
    new Path(spark.conf.get("spark.sql.warehouse.dir"), table)

  private def fs = wh("x").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** data files per bucket id, from the `_NNNNN` in bucketed file names. */
  private def filesPerBucket(table: String): Map[String, Int] = {
    val re = "_(\\d{5})\\.".r
    fs.listStatus(wh(table)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("part-"))
      .flatMap(n => re.findFirstMatchIn(n).map(_.group(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  private def slice(a: Long, b: Long) =
    spark.range(a, b).select(col("id").as("k"), (col("id") % 7).as("v"))

  test("compact restores one file per bucket, preserves rows exactly, " +
    "and removes the join's Sort nodes") {
    val t = "compact_spec_tbl"
    BucketedTables.save(slice(0, 1000), t, 4, "k")
    try {
      BucketedTables.append(slice(1000, 1500), t, 4, Seq("k"))
      BucketedTables.append(slice(1500, 2000), t, 4, Seq("k"))
      assert(filesPerBucket(t).values.toSet == Set(3),
        s"3 writes must leave 3 files per bucket: ${filesPerBucket(t)}")
      val before = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        def joinPlan() = spark.table(t)
          .join(spark.table(t).select(col("k"), col("v").as("v2")), "k")
          .queryExecution.executedPlan.toString
        // the degradation under repair: multi-file buckets don't report
        // sort order, so the exchange-free join still pays a Sort
        val degraded = joinPlan()
        assert(!degraded.contains("Exchange"), degraded)
        assert(degraded.contains("- Sort "),
          s"precondition: appended buckets should re-grow Sorts:\n$degraded")

        BucketedTables.compact(spark, t, 4, Seq("k"))

        assert(filesPerBucket(t).values.toSet == Set(1),
          s"compaction must leave 1 file per bucket: ${filesPerBucket(t)}")
        val after = spark.table(t).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(after == before, "compaction changed the rows")
        val repaired = joinPlan()
        assert(!repaired.contains("Exchange"), repaired)
        assert(!repaired.contains("- Sort "),
          s"compacted buckets must join sort-free:\n$repaired")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
      // no debris: the staging dir was renamed into place and the
      // backup deleted; only the live table remains
      val debris = fs.listStatus(wh(t).getParent).map(_.getPath.getName)
        .filter(n => n.startsWith(s"${t}_stg_") || n == s"${t}_precompact")
      assert(debris.isEmpty, s"compaction debris: ${debris.mkString(",")}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("a compaction that crashed between stage-commit and swap leaves " +
    "no orphan staging table after the next compact()") {
    val t = "compact_orphan_tbl"
    BucketedTables.save(slice(0, 500), t, 4, "k")
    try {
      BucketedTables.append(slice(500, 800), t, 4, Seq("k"))
      val before = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // simulate the crash window: a fully COMMITTED staged rewrite
      // (table-sized!) whose owner died before the swap renames — the
      // live table is intact, the stage is debris
      val orphan = s"${t}_stg_deadbeefdeadbeefdeadbeefdeadbeef"
      fs.mkdirs(wh(orphan))
      fs.createNewFile(new Path(wh(orphan), "_SUCCESS"))
      fs.createNewFile(new Path(wh(orphan), "part-00000-fake_00000.parquet"))

      BucketedTables.compact(spark, t, 4, Seq("k"))

      assert(!fs.exists(wh(orphan)),
        "orphaned committed staging dir must be swept on compact() entry")
      val debris = fs.listStatus(wh(t).getParent).map(_.getPath.getName)
        .filter(n => n.startsWith(s"${t}_stg_") || n == s"${t}_precompact")
      assert(debris.isEmpty, s"compaction debris: ${debris.mkString(",")}")
      assert(filesPerBucket(t).values.toSet == Set(1))
      val after = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(after == before, "orphan sweep touched live rows")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("a compaction that crashed between the swap renames is recovered " +
    "on the next compact() entry") {
    val t = "compact_crash_tbl"
    BucketedTables.save(slice(0, 500), t, 4, "k")
    try {
      BucketedTables.append(slice(500, 800), t, 4, Seq("k"))
      val before = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // simulate the crash window: live renamed aside, stage never
      // swapped in (and lost with the dead JVM's tmp cleanup)
      assert(fs.rename(wh(t), wh(s"${t}_precompact")))
      assert(!fs.exists(wh(t)))

      BucketedTables.compact(spark, t, 4, Seq("k"))

      assert(fs.exists(new Path(wh(t), "_SUCCESS")))
      assert(!fs.exists(wh(s"${t}_precompact")), "backup must be consumed")
      assert(filesPerBucket(t).values.toSet == Set(1))
      val after = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(after == before, "recovery lost rows")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
