package graft.sink

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the co-located-join half of the write-side
  * story (ClusteredWrite is the file-skipping half).
  *
  * `bucketBy(n, key)` + `sortBy(key)` at write time hash-partitions each
  * table into `n` sorted buckets recorded in the catalog. A join between
  * two tables bucketed the same way on the join key then needs NO
  * exchange on either side — Spark proves both children already satisfy
  * the required hash distribution — and with `sortBy` no sort either,
  * so the 100 TB fact-to-fact join degenerates to a per-bucket merge.
  * That shuffle is the single largest cost in a repeated big-join
  * pipeline; paying it once at write time and never again per query is
  * the point of bucketing (BucketedJoinSpec pins the exchange-free plan
  * shape).
  *
  * Notes for cluster use:
  *  - both sides must agree on bucket count (or be integer multiples,
  *    with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
  *  - bucket pruning applies equality predicates on the bucket key to
  *    skip whole buckets at scan time;
  *  - pick `n` so one bucket of the BIG table fits an executor's task
  *    comfortably (≈ table_size / n ≤ a few hundred MB).
  */
object BucketedTables {

  /** Saves `df` as a bucketed, per-bucket-sorted catalog table.
    *
    * The `repartition(numBuckets, key)` before the write is load-bearing
    * for the no-sort half of the contract: it uses the same murmur3 hash
    * as the bucket router, so each write task holds exactly one bucket's
    * rows and each bucket lands in ONE file. Spark's scan only treats a
    * bucket as pre-sorted when it has a single file (two sorted files
    * would need a merge); with multiple input partitions per bucket the
    * join would keep its Sort nodes — still exchange-free, but paying a
    * per-query sort that the write already paid for. */
  def save(df: DataFrame, table: String, numBuckets: Int, key: String): Unit =
    save(df, table, numBuckets, Seq(key))

  /** Multi-column variant — the bucket hash (and therefore the
    * exchange-free join guarantee) covers the whole key tuple, so a join
    * must use ALL bucket columns as (a superset of) its equi-keys to
    * skip the shuffle. Used by the q107 persistent LSH band index,
    * bucketed on (band, k1, k2). */
  def save(df: DataFrame, table: String, numBuckets: Int,
           keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketed save needs at least one key column")
    df.repartition(numBuckets, keys.map(df(_)): _*)
      .write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Appends rows to an EXISTING bucketed table, preserving the bucket
    * layout (`numBuckets`/`keys` must match the table's spec — Spark
    * validates and rejects a mismatch rather than corrupting the
    * layout). The same pre-repartition keeps it one NEW file per bucket
    * per append. After any append a bucket holds >1 file, so scans no
    * longer treat it as pre-sorted (joins re-grow their per-bucket Sort)
    * — but the exchange-free guarantee, the 100 TB cost, is unchanged:
    * bucket membership is by content hash, which appends preserve.
    * Periodic [[compact]]ion restores the one-file-per-bucket no-sort
    * property. Used by the q107 incremental
    * ingest path: admitted batches append their band rows so the index
    * grows without ever rescanning the corpus. */
  def append(df: DataFrame, table: String, numBuckets: Int,
             keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketed append needs at least one key column")
    df.repartition(numBuckets, keys.map(df(_)): _*)
      .write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("append")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Restores the one-file-per-bucket (and therefore no-sort-at-join)
    * property that [[append]]s erode: rewrites the table's CURRENT
    * contents through the same repartition+bucketBy shape as [[save]]
    * into a staging directory, then swaps it into the live location.
    * File count per bucket returns to 1 no matter how many batches
    * appended (BucketCompactSpec pins file counts, preserved rows, and
    * the join plan's Sort nodes gone), and the rewrite is EXCHANGE-FREE
    * — source and target share the bucket layout, so each task streams
    * one bucket's files into that bucket's one output file with no
    * shuffle (at 100 TB, compaction costs a read + a write, period) —
    * so a long-running ingest stream
    * runs this every N admitted batches (the [[graft.streaming
    * .IngestDedup]] `compactEvery` hook) instead of degrading its own
    * probe forever.
    *
    * Atomicity: the stage is committed (`_SUCCESS`) before any mutation
    * of the live dir, and the swap is two atomic renames (live → backup,
    * stage → live). The instant between them is the ONLY non-atomic
    * point; a crash there leaves the data complete in the backup, which
    * the next compact() restores on entry before doing anything else.
    * Single-compactor discipline is the caller's (one compactor —
    * normally the ingest stream owner; concurrent READERS are safe at
    * every point because both renamed states are committed builds).
    * Appends racing the swap can vanish with the backup — quiesce
    * admissions around compaction, as a stream's foreachBatch naturally
    * does. */
  def compact(s: org.apache.spark.sql.SparkSession, table: String,
              numBuckets: Int, keys: Seq[String]): Unit = synchronized {
    val whDir = s.conf.get("spark.sql.warehouse.dir")
    val wh = new org.apache.hadoop.fs.Path(whDir, table)
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    def complete(p: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    val bak = new org.apache.hadoop.fs.Path(whDir, table + "_precompact")
    // crash recovery first: a compaction that died between the two swap
    // renames left the live dir missing and the full data in the backup
    if (!fs.exists(wh) && fs.exists(bak))
      require(fs.rename(bak, wh), s"could not restore $bak to $wh")
    if (fs.exists(bak)) fs.delete(bak, true) // a completed swap's leftover
    // orphan sweep: a compaction that crashed AFTER its staged rewrite
    // committed but BEFORE the swap renames leaves a committed
    // `<table>_stg_<uuid>` sibling holding a full copy of the table
    // (and possibly its catalog entry). Single-compactor discipline
    // means no live compactor owns one at entry — clear them all, or
    // every such crash permanently leaks a table-sized directory.
    val whParent = new org.apache.hadoop.fs.Path(whDir)
    if (fs.exists(whParent))
      fs.listStatus(whParent)
        .filter(_.getPath.getName.startsWith(table + "_stg_"))
        .foreach { st =>
          s.sql(s"DROP TABLE IF EXISTS ${st.getPath.getName}")
          fs.delete(st.getPath, true) // DROP of an external table keeps files
        }
    require(fs.exists(wh) && complete(wh),
      s"compact($table): no committed table at $wh")
    s.catalog.refreshTable(table) // scan the current files, not a cache
    val stg = table + "_stg_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    // Compaction is exchange-free: the source scan is the SAME bucket
    // layout the rewrite targets, so save()'s repartition is optimized
    // away as redundant — each write task reads exactly one bucket's
    // files and writes that bucket's one output file. That only holds
    // while the scan actually reads bucketed: with nothing downstream
    // requiring the distribution, DisableUnnecessaryBucketedScan would
    // flip the scan to per-FILE partitions and the write would emit one
    // file per input file — a no-op compaction. Pin the bucketed scan
    // on for the staged rewrite.
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAuto = s.conf.getOption(autoKey)
    s.conf.set(autoKey, "false")
    try save(s.table(table), stg, numBuckets, keys)
    finally prevAuto.fold(s.conf.unset(autoKey))(v => s.conf.set(autoKey, v))
    val stgPath = new org.apache.hadoop.fs.Path(whDir, stg)
    require(complete(stgPath), s"staged compaction $stg did not commit")
    require(fs.rename(wh, bak), s"could not move $wh aside to $bak")
    require(fs.rename(stgPath, wh), s"could not swap $stgPath into $wh")
    sweepNestedStaging(fs, wh)
    require(complete(wh), s"compacted $wh lost its commit marker")
    fs.delete(bak, true)
    s.sql(s"DROP TABLE IF EXISTS $stg") // its dir was renamed away
    s.catalog.refreshTable(table)
  }

  /** Ensures a bucketed catalog table exists whose content is a pure
    * function of its name, crash- and race-safe without locks (used by
    * the q107 band index and the q110 bucketed-orders copy; the
    * session-independent hazard is that the in-memory catalog dies with
    * the JVM while the warehouse files don't, so a fresh session must
    * handle leftovers, and a concurrent session may race the build):
    *
    *  - a COMPLETE directory (committer's `_SUCCESS` present) is
    *    ADOPTED as-is — any complete build is THE build;
    *  - an incomplete leftover (crashed writer) is cleared;
    *  - a fresh build goes to a session-unique staging directory and
    *    enters the final location by one atomic rename, so no reader
    *    or racer observes a half-written table; a rename loser discards
    *    its staging output and adopts the winner's;
    *  - registration is EXTERNAL (schema from `df`), so a later DROP
    *    TABLE leaves the files for the next session to adopt.
    *
    * `df` supplies the build rows AND the registration schema (schema
    * use is analysis-only — no job runs on the adopt path).
    * BandIndexGuardSpec pins all three entry paths.
    *
    * Version drift: the returned table name embeds the bucket count
    * (a count change can never silently re-register old files under a
    * new layout — the bucket-aware scan would misroute rows), and the
    * adopt path validates the on-disk parquet schema against `df`'s
    * (footer-only read) — a column-drifted leftover from an older
    * engine version is cleared and rebuilt instead of adopted. */
  def ensure(s: org.apache.spark.sql.SparkSession, table: String,
             df: => DataFrame, numBuckets: Int,
             keys: Seq[String]): String = {
    lazy val frame = df
    ensureLazy(s, table, frame.schema, () => frame, numBuckets, keys)
  }

  /** [[ensure]] with the registration schema supplied EXPLICITLY, so the
    * build thunk is only evaluated when a build actually runs. The plain
    * `ensure` evaluates `df` even on the adopt path (schema is needed
    * for the footer check and the DDL) — harmless when constructing the
    * frame is plan-only, wrong when construction itself runs jobs (the
    * q152 IVF centroids train driver-side k-means: a fresh session
    * adopting the on-disk index must NOT retrain). `schema` must match
    * what `build()`'s save writes, by (name, dataType). */
  def ensureLazy(s: org.apache.spark.sql.SparkSession, table: String,
                 schema: org.apache.spark.sql.types.StructType,
                 build: () => DataFrame, numBuckets: Int,
                 keys: Seq[String]): String = synchronized {
    val full = s"${table}_b$numBuckets"
    if (!s.catalog.tableExists(full)) {
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), full)
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      def complete(p: org.apache.hadoop.fs.Path) =
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      def schemaMatches: Boolean = {
        val disk = s.read.parquet(wh.toString).schema
        disk.map(f => (f.name, f.dataType)) ==
          schema.map(f => (f.name, f.dataType))
      }
      // stale-version leftovers fail the footer-schema check and take
      // the rebuild path exactly like a crashed partial write
      if (!fs.exists(wh) || !complete(wh) || !schemaMatches) {
        if (fs.exists(wh)) fs.delete(wh, true) // crashed partial write
        val stg = full + "_stg_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        save(build(), stg, numBuckets, keys)
        val stgPath = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), stg)
        if (!fs.rename(stgPath, wh)) {
          // lost the race: a concurrent session renamed its complete
          // build in first. Discard ours, adopt theirs below.
          fs.delete(stgPath, true)
          require(complete(wh),
            s"table $wh exists but is incomplete after a lost build " +
              "race — a concurrent writer crashed mid-rename?")
        } else {
          // rename=true is NOT proof we won: RawLocalFileSystem falls
          // back to FileUtil.copy when File.renameTo fails, which treats
          // an existing destination dir as a PARENT and moves the
          // staging dir INSIDE it — a race loser that took the winner
          // path with the lost-race completeness check never run, and
          // with its whole build left as un-'_'-prefixed debris one
          // recursive-listing config away from scanning as duplicate
          // rows. Sweep any nested staging dirs (ours or another
          // loser's — a correct build never contains one) and re-assert
          // completeness.
          sweepNestedStaging(fs, wh)
          require(complete(wh),
            s"table $wh has no _SUCCESS after rename — the rename " +
              "landed inside a concurrent writer's incomplete build?")
        }
        // staging catalog entry now points at a gone (renamed) or
        // deleted directory; dropping it deletes nothing extant
        s.sql(s"DROP TABLE IF EXISTS $stg")
      }
      s.sql(
        s"""CREATE TABLE $full (${schema.toDDL})
           |USING parquet
           |CLUSTERED BY (${keys.mkString(", ")})
           |SORTED BY (${keys.mkString(", ")})
           |INTO $numBuckets BUCKETS
           |LOCATION '${wh.toString}'""".stripMargin)
    }
    full
  }

  /** Deletes any `*_stg_*` directory nested directly under `table` —
    * the residue of a lost build race on filesystems whose rename
    * copies into an existing destination (RawLocalFileSystem). A
    * correct build never nests one, so deletion is always safe; left in
    * place the debris is one recursive-listing config away from
    * scanning as duplicate rows (BandIndexGuardSpec reproduces the
    * Hadoop move-into-dest behavior and pins the sweep). */
  private[graft] def sweepNestedStaging(fs: org.apache.hadoop.fs.FileSystem,
                                       table: org.apache.hadoop.fs.Path): Unit =
    fs.listStatus(table).foreach { st =>
      if (st.isDirectory && st.getPath.getName.contains("_stg_"))
        fs.delete(st.getPath, true)
    }
}
